package graft

import org.apache.spark.sql.functions._
import graft.operators.Scc

/** Exact SCC decomposition: known digraphs decompose correctly,
  * including the shapes that break naive single-pass labeling (shared
  * forward/backward minima across different components, settle chains
  * that force multiple outer rounds). */
class SccSpec extends SparkSpec {

  import spark.implicits._

  private def sccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc.strongComponents(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two 2-cycles joined by a one-way bridge stay separate components") {
    // 1⇄2 → 3⇄4: the bridge must not merge them
    val got = sccOf(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("a directed chain is all singletons") {
    val got = sccOf(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got === Map(5L -> 5L, 4L -> 4L, 3L -> 3L, 2L -> 2L, 1L -> 1L))
  }

  test("the naive (fwd,bwd)-pair counterexample: same labels, different components") {
    // 1 → u → 0 and 1 → v → 0: u and v share fwd-min 0 and bwd-min 1
    // but are NOT mutually reachable — each must be its own singleton
    val got = sccOf(Seq((1L, 10L), (10L, 0L), (1L, 20L), (20L, 0L), (0L, 1L)))
    // 0 → 1 closes a big cycle through BOTH u and v: 0,1,10,20 all mutual
    assert(got.values.toSet.size === 1)
    val got2 = sccOf(Seq((1L, 10L), (10L, 0L), (1L, 20L), (20L, 0L)))
    assert(got2 === Map(0L -> 0L, 1L -> 1L, 10L -> 10L, 20L -> 20L))
  }

  test("settle chains force multiple outer rounds and still finish") {
    // three 2-cycles in a one-way chain with ids arranged so later
    // components see smaller forward minima: (9,8) → (5,4) → (1,2)
    val got = sccOf(Seq((9L, 8L), (8L, 9L), (8L, 5L),
      (5L, 4L), (4L, 5L), (4L, 1L), (1L, 2L), (2L, 1L)))
    assert(got === Map(9L -> 8L, 8L -> 8L, 5L -> 4L, 4L -> 4L, 1L -> 1L, 2L -> 1L))
  }

  test("self-loops and duplicate edges are harmless") {
    val got = sccOf(Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L), (3L, 3L)))
    // node 3 only has a self-loop: it never enters the min-label rounds
    // but is a legitimate singleton SCC (it reaches itself both ways)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("matches a brute-force decomposition on a seeded random digraph") {
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (u, v) => u != v }.distinct
    // brute force: Floyd–Warshall reachability, mutual ⇒ same component
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (u, v) => reach(u.toInt)(v.toInt) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val want = nodes.map { u =>
      val mates = nodes.filter(v =>
        v == u || (reach(u.toInt)(v.toInt) && reach(v.toInt)(u.toInt)))
      u -> mates.min
    }.toMap
    assert(sccOf(edges) === want)
  }
}
