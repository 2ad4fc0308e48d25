package graft

import graft.operators.Bfs

/** Depth-bounded multi-source BFS: exact hop distances, frontier-only
  * expansion, depth budget, unreachable nodes absent. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long], rounds: Int): Map[Long, Int] = {
    val stage = java.nio.file.Files.createTempDirectory("bfs-spec").toString
    val undirected = edges ++ edges.map { case (u, v) => (v, u) }
    Bfs.distances(undirected.toDF("u", "v"), seeds.toDF("id"), rounds, stage)
      .as[(Long, Int)].collect().toMap
  }

  test("chain distances are exact hop counts up to the depth budget") {
    // 1-2-3-4-5-6, seed 1, 3 rounds: node 5 is 4 hops away — outside budget
    val chain = (1L until 6L).map(i => (i, i + 1))
    assert(bfs(chain, Seq(1L), 3) === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("multi-source: every node takes the distance to its NEAREST seed") {
    // 1-2-3-4-5, seeds {1, 5}: 3 is 2 hops from both; 2 and 4 are 1 hop
    val chain = (1L until 5L).map(i => (i, i + 1))
    assert(bfs(chain, Seq(1L, 5L), 3) ===
      Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("disconnected nodes never appear; isolated seeds appear at dist 0") {
    val out = bfs(Seq((1L, 2L), (8L, 9L)), Seq(1L, 7L), 2)
    assert(out === Map(1L -> 0, 7L -> 0, 2L -> 1)) // 8, 9 unreachable
  }

  test("a cycle does not inflate distances (min wins over the long way)") {
    // square 1-2-3-4-1, seed 1: node 3 is 2 hops either way
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(bfs(sq, Seq(1L), 4) === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  private def sssp(
      edges: Seq[(Long, Long, Long)], seeds: Seq[Long], rounds: Int): Map[Long, Long] = {
    val stage = java.nio.file.Files.createTempDirectory("sssp-spec").toString
    val undirected = edges ++ edges.map { case (u, v, c) => (v, u, c) }
    Bfs.weightedDistances(
        undirected.toDF("u", "v", "cost"), seeds.toDF("id"), rounds, stage)
      .as[(Long, Long)].collect().toMap
  }

  test("weighted: a longer-but-cheaper path beats the direct edge") {
    // 1→3 costs 10 direct, but 1→2→3 costs 2+3=5; needs 2 relaxations
    val g = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(sssp(g, Seq(1L), 2) === Map(1L -> 0, 2L -> 2, 3L -> 5))
  }

  test("weighted: a settled node improves in a later round (Bellman-Ford)") {
    // chain 1-2-3-4 with cost 1 each vs direct 1→4 cost 10: round 1
    // labels 4 at 10, round 3 improves it to 3
    val g = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 10L))
    assert(sssp(g, Seq(1L), 1)(4L) === 10L)
    assert(sssp(g, Seq(1L), 3)(4L) === 3L)
  }

  test("weighted multi-source takes the cheapest seed, depth-bounded") {
    val g = Seq((1L, 2L, 5L), (5L, 4L, 1L), (4L, 3L, 1L), (3L, 2L, 1L))
    // seeds {1, 5}: node 2 costs 5 via seed 1 but 3 via 5→4→3→2
    assert(sssp(g, Seq(1L, 5L), 3)(2L) === 3L)
  }

  test("per-source labels equal one independent BFS per seed") {
    // asymmetric graph: chain 1-2-3-4 plus branch 2-8, seeds {1, 4, 9}
    // (9 isolated). The simultaneous src-keyed run must match running
    // distances() separately from each seed — no cross-seed min leakage
    // (the nearest-seed collapse is exactly what per-source must NOT do).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 8L))
    val undirected = edges ++ edges.map { case (u, v) => (v, u) }
    val seeds = Seq(1L, 4L, 9L)
    val stage = java.nio.file.Files.createTempDirectory("psrc-spec").toString
    val got = Bfs.perSourceDistances(
        undirected.toDF("u", "v"), seeds.toDF("id"), 3, stage)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    seeds.foreach { sd =>
      assert(got(sd) === bfs(edges, Seq(sd), 3), s"seed $sd")
    }
    // seed 1 vs seed 4 genuinely differ on node 8 (2 hops vs 3) — the
    // nearest-seed collapse would have given both the min
    assert(got(1L)(8L) === 2 && got(4L)(8L) === 3)
  }

  test("bitmask MS-BFS ≡ label-relaxation per-source BFS on a random graph") {
    // 150 nodes, ~600 undirected edges, 70 seeds (spans 2 mask words at
    // 60 bits/word) — the bitmask algebra must reproduce the relaxation
    // form exactly, including multi-word seeds and unreached nodes
    val rnd = new scala.util.Random(7)
    val edges0 = Seq.fill(600)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (u, v) => u != v }.distinct
    val undirected = (edges0 ++ edges0.map { case (u, v) => (v, u) }).distinct
    val seeds = (0L until 150L by 2).take(70)
    val s1 = java.nio.file.Files.createTempDirectory("msbfs-a").toString
    val s2 = java.nio.file.Files.createTempDirectory("msbfs-b").toString
    val edf = undirected.toDF("u", "v")
    val ref = Bfs.perSourceDistances(edf, seeds.toDF("id"), 3, s1)
      .as[(Long, Long, Int)].collect().toSet
    val got = Bfs.perSourceDistancesBitmask(edf, seeds.toDF("id"), 3, s2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === ref)
    assert(ref.nonEmpty && ref.exists(_._3 == 3))
  }
}
