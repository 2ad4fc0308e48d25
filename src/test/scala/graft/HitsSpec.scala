package graft

import graft.operators.Hits
import org.apache.spark.sql.functions._

/** HITS hubs & authorities: mutual-reinforcement semantics on graphs
  * with known structure, under the exact integer (max-normalized)
  * formulation. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def hits(
      edges: Seq[(String, String, Long)], iters: Int): Map[String, (Long, Long)] =
    Hits.scores(edges.toDF("src", "dst", "w"), iters)
      .select(col("id"), col("h"), col("a"))
      .as[(String, Long, Long)].collect()
      .map { case (id, h, a) => id -> (h, a) }.toMap

  test("star: the pointed-at center is the max authority, spokes are hubs") {
    val g = Seq(("s1", "c", 1L), ("s2", "c", 1L), ("s3", "c", 1L))
    val out = hits(g, 2)
    val scale = 1000000000L
    assert(out("c")._2 === scale)     // sole (hence max) authority
    assert(out("c")._1 === 0L)        // no out-edges → zero hub
    assert(out("s1")._1 === scale)    // symmetric spokes all max hubs
    assert(out("s2")._1 === scale)
    assert(out("s1")._2 === 0L)       // nothing points at a spoke
  }

  test("edge weight shifts authority toward the heavier target") {
    // h1 points at a with weight 3, at b with weight 1
    val out = hits(Seq(("h1", "a", 3L), ("h1", "b", 1L)), 2)
    assert(out("a")._2 > out("b")._2)
    // divisor-form normalization: the winner lands in [scale, 2·scale)
    // (x div (mx div scale) ≥ scale for x = mx), not exactly at scale
    assert(out("a")._2 >= 1000000000L && out("a")._2 < 2000000000L)
  }

  test("mutual reinforcement: a hub pointing at strong authorities beats one pointing at weak") {
    // authority "big" has 3 in-edges, "small" has 1; hub hb→big, hs→small
    val g = Seq(("x1", "big", 1L), ("x2", "big", 1L), ("hb", "big", 1L),
      ("hs", "small", 1L))
    val out = hits(g, 2)
    assert(out("hb")._1 > out("hs")._1)
  }
}
