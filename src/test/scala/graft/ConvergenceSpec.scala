package graft

import java.nio.file.Files
import graft.operators.{Bfs, Hits, PageRank}
import org.apache.spark.sql.functions._

/** Convergence-parameterized graph iteration (maxRounds + tolerance):
  * the 100 TB contract where the right round budget isn't knowable up
  * front. The fixed-round registry queries stay as-is; these specs pin
  * that the converged variants (a) stop EARLY once the exact-integer
  * delta probe reaches tolerance, (b) agree bit-for-bit with the
  * fixed-round implementation at the same round count, and (c) that
  * SSSP's frontier-empty early exit does the same for Bellman-Ford.
  */
class ConvergenceSpec extends SparkSpec {
  import spark.implicits._

  test("k-truss peel cascades to the fixed point and stops when closed") {
    // triangle LADDER 1..10 (edges i→i+1, i→i+2): interior edges sit in
    // exactly 2 triangles but the ENDS sit in 1, so a support≥2 peel
    // removes the rim, exposes the next edges, and cascades until the
    // whole ladder dissolves — a genuine multi-round collapse. A K5 on
    // 100..104 (every edge in 3 triangles) is the stable core the peel
    // must NOT touch.
    val ladder = (1 to 9).map(i => (i.toLong, (i + 1).toLong)) ++
      (1 to 8).map(i => (i.toLong, (i + 2).toLong))
    val k5 = (100 to 104).combinations(2).map(p => (p(0).toLong, p(1).toLong)).toSeq
    val edges = (ladder ++ k5).toDF("u", "v")
    val stage = Files.createTempDirectory("trussfp").toString
    val (out, rounds) = graft.queries.Graphs.trussFixpoint(
      spark, edges, minSup = 2L, maxRounds = 20, stagePath = stage)
    assert(rounds > 2, s"ladder must cascade over multiple rounds (rounds=$rounds)")
    assert(rounds < 20, s"did not reach the fixed point early (rounds=$rounds)")
    val surviving = out.select("u", "v").as[(Long, Long)].collect().toSet
    assert(surviving === k5.toSet, "fixed point must be exactly the K5 core")
    // closed: every surviving edge carries support >= 2 within the core
    assert(out.filter(col("s") < 2).count() === 0)
  }

  /** Deep synthetic graph: a directed chain 1→2→…→n. Rank/score mass
    * needs ~n rounds to propagate to the tail, so convergence depth
    * scales with n — the "deep" shape a fixed small budget can't cover. */
  private def chain(n: Int) =
    (1 until n).map(i => (i.toLong, (i + 1).toLong, 1L)).toDF("src", "dst", "w")

  test("PageRank converges on a deep chain within budget and stops early") {
    val n = 12
    val (r, rounds) = PageRank.ranksConverged(
      chain(n), maxRounds = 25, toleranceUnits = 0L,
      stagePath = Some(Files.createTempDirectory("prc").toString))
    // node k's rank is settled after k rounds (only upstream feeds it),
    // so the exact-integer fixed point lands in ~n+1 rounds, well under
    // the 25-round budget — the probe must notice and stop
    assert(rounds < 25, s"did not converge early (rounds=$rounds)")
    assert(rounds >= n - 1, s"chain depth $n cannot settle in $rounds rounds")
    // bit-for-bit agreement with the fixed-round implementation
    val fixed = PageRank.ranks(chain(n), iters = rounds)
      .as[(Long, Long)].collect().toMap
    val conv = r.as[(Long, Long)].collect().toMap
    assert(conv === fixed)
    // and genuinely converged: one more fixed round changes nothing
    val more = PageRank.ranks(chain(n), iters = rounds + 1)
      .as[(Long, Long)].collect().toMap
    assert(more === fixed)
  }

  test("PageRank nonzero tolerance trades rounds for precision, monotonically") {
    val g = chain(8)
    val (_, tight) = PageRank.ranksConverged(g, maxRounds = 25, toleranceUnits = 0L)
    val (_, loose) = PageRank.ranksConverged(
      g, maxRounds = 25, toleranceUnits = 1000000000L) // 1e9 of 1e12 scale
    assert(loose <= tight)
    assert(loose >= 1)
  }

  test("HITS converges on a chain and agrees with the fixed-round scores") {
    val g = chain(8)
    val (s, rounds) = Hits.scoresConverged(
      g, maxRounds = 15, toleranceUnits = 0L,
      stagePath = Some(Files.createTempDirectory("hitsc").toString))
    assert(rounds < 15, s"did not converge early (rounds=$rounds)")
    val fixed = Hits.scores(g, iters = rounds)
      .select(col("id"), col("h"), col("a"))
      .as[(Long, Long, Long)].collect().toSet
    val conv = s.select(col("id"), col("h"), col("a"))
      .as[(Long, Long, Long)].collect().toSet
    assert(conv === fixed)
  }

  test("HITS checkBounds rejects a graph whose incident weight can overflow the gather") {
    // one node receiving total weight > 2^63 / (2*scale)
    val w = Long.MaxValue / (2 * 1000000000L) // per-edge just at the cap...
    val g = Seq((1L, 9L, w), (2L, 9L, w)).toDF("src", "dst", "w") // ...so 2 edges exceed it
    intercept[IllegalArgumentException] {
      Hits.scores(g, iters = 1, checkBounds = true)
    }
    // the same graph with tame weights passes the guard
    Hits.scores(Seq((1L, 9L, 5L), (2L, 9L, 7L)).toDF("src", "dst", "w"),
      iters = 1, checkBounds = true).collect()
  }

  test("SSSP (Bellman-Ford) exits as soon as the frontier empties, not at the budget") {
    val stage = Files.createTempDirectory("ssspc").toString
    val edges = chain(7).select(col("src").as("u"), col("dst").as("v"),
      col("w").cast("long").as("cost"))
    edges.write.mode("overwrite").parquet(s"$stage/edges")
    val labels = Bfs.weightedDistances(
      spark.read.parquet(s"$stage/edges"),
      Seq(Tuple1(1L)).toDF("id"), rounds = 50, stagePath = stage)
    assert(labels.as[(Long, Long)].collect().toMap ===
      (1 to 7).map(i => i.toLong -> (i - 1).toLong).toMap)
    // staged round dirs prove the early exit: w0 + one per executed
    // round, far fewer than the 50-round budget
    val stagedRounds = new java.io.File(stage).list()
      .count(nm => nm.startsWith("w") && nm.drop(1).forall(_.isDigit))
    assert(stagedRounds <= 9, s"expected early exit, saw $stagedRounds staged rounds")
  }
}
