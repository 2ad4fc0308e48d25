package graft

import graft.operators.Components

/** Connected components: transitivity, cycles, disjoint clusters, and
  * the label restaging path for deeper graphs.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)],
      stage: Option[String] = None): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), stagePath = stage)
      .as[(Long, Long)].collect().toMap

  test("transitive chain collapses without a direct edge") {
    // 1-2, 2-3: no (1,3) pair was ever emitted, yet one cluster results
    assert(cc(Seq((1L, 2L), (2L, 3L))) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint clusters, cycles, and unordered edges label independently") {
    val labels = cc(Seq((5L, 4L), (4L, 5L), (9L, 7L), (7L, 8L), (8L, 9L), (2L, 1L)))
    assert(labels === Map(4L -> 4L, 5L -> 4L, 7L -> 7L, 8L -> 7L, 9L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("pointer jumping matches plain propagation and converges in log rounds on a 64-chain") {
    val stage = java.nio.file.Files.createTempDirectory("cc-jump").toString
    val chain = (1L until 64L).map(i => (i, i + 1)) // diameter 63
    // maxIters = 10 < diameter: only the halving shortcut can converge —
    // correct labels out of this budget PROVE the log-round behavior
    val jumped = Components.connectedComponentsJump(
        chain.toDF("a", "b"), stage, maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(jumped === (1L to 64L).map(_ -> 1L).toMap)
    // equivalence with the plain algorithm on a branchy graph
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L), (3L, 7L))
    val stage2 = java.nio.file.Files.createTempDirectory("cc-jump2").toString
    val a = Components.connectedComponentsJump(edges.toDF("a", "b"), stage2)
      .as[(Long, Long)].collect().toMap
    assert(a === cc(edges))
  }

  test("long path converges through periodic label restaging") {
    val stage = java.nio.file.Files.createTempDirectory("cc-stage").toString
    val path = (1L until 12L).map(i => (i, i + 1)) // deep chain: many staged rounds
    val labels = cc(path, stage = Some(stage))
    assert(labels.values.toSet === Set(1L), "one component, min-id label")
    assert(labels.keySet === (1L to 12L).toSet)
  }

  test("empty edge set yields an empty labeling, no iteration blowup") {
    assert(cc(Seq.empty) === Map.empty)
  }

  test("pagerank: symmetric cycle is uniform, sinks drain mass, staging changes nothing") {
    import graft.operators.PageRank
    import org.apache.spark.sql.functions.col
    val scale = 1000000000000L
    // 4-cycle with equal weights: perfect symmetry ⇒ every node keeps
    // exactly the uniform rank at every round (integer division included)
    val cyc = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L), ("d", "a", 1L))
      .toDF("src", "dst", "w")
    val rc = PageRank.ranks(cyc, iters = 3).as[(String, Long)].collect().toMap
    val unit = scale / 4
    assert(rc.values.toSet === Set(15L * scale / 100 / 4 + 85L * unit / 100),
      "cycle fixpoint after round 1")
    // star into a sink: the sink must out-rank the spokes, and total mass
    // stays <= scale (truncation + dangling only ever lose units)
    val star = Seq(("s1", "hub", 1L), ("s2", "hub", 1L), ("s3", "hub", 1L))
      .toDF("src", "dst", "w")
    val rs = PageRank.ranks(star, iters = 3).as[(String, Long)].collect().toMap
    assert(rs("hub") > rs("s1") && rs("s1") === rs("s2"))
    assert(rs.values.sum <= scale)
    // staged and unstaged runs are bit-identical
    val stage = java.nio.file.Files.createTempDirectory("pr-stage").toString
    val staged = PageRank.ranks(star, iters = 3, stagePath = Some(stage))
      .as[(String, Long)].collect().toMap
    assert(staged === rs)
    // ranks are non-negative and node set is preserved
    assert(PageRank.ranks(cyc, iters = 1).filter(col("r") < 0).isEmpty)
  }

  test("personalized pagerank: mass stays within k hops of the seed set") {
    import graft.operators.PageRank
    import spark.implicits._
    // path graph 1-2-3-4-5-6 (both directions), seed = node 1
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (und ++ und.map(_.swap)).map { case (s, d) => (s, d, 1L) }
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val r = PageRank.personalizedRanks(edges, seeds, iters = 2)
      .as[(Long, Long)].collect().toMap
    // after 2 rounds mass can reach at most 2 hops from the seed
    assert(r(4L) === 0L && r(5L) === 0L && r(6L) === 0L,
      s">2-hop nodes must hold exactly zero mass: $r")
    assert(r(1L) > r(2L) && r(2L) > 0L && r(3L) > 0L,
      s"seed retains the most mass, neighbors decay: $r")
    // uniform pagerank on the same graph gives every node nonzero rank —
    // the personalization is what concentrates it
    val uni = PageRank.ranks(edges, iters = 2).as[(Long, Long)].collect().toMap
    assert(uni.values.forall(_ > 0L))
  }
}
