package graft

import org.apache.spark.sql.functions._
import graft.operators.LabelProp

/** Clamped-majority label propagation semantics on a hand-built graph. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // undirected helper
  private def edges(e: (Long, Long)*) =
    (e ++ e.map(p => (p._2, p._1))).toDF("src", "dst")

  test("majority wins, ties break to the smallest label, spread is clamped") {
    //   1(A) - 3 - 2(B)     3 sees A and B once each -> tie -> min label
    //   4(B) - 3            ... but 4 makes it two B's vs one A -> B
    val g = edges((1L, 3L), (2L, 3L), (4L, 3L), (3L, 5L))
    val seeds = Seq((1L, 1), (2L, 2), (4L, 2)).toDF("id", "label")
    val r1 = LabelProp.propagate(g, seeds, rounds = 1).as[(Long, Int)].collect().toMap
    assert(r1(3L) === 2)     // majority B
    assert(r1.get(5L).isEmpty) // not yet reached
    val r2 = LabelProp.propagate(g, seeds, rounds = 2).as[(Long, Int)].collect().toMap
    assert(r2(3L) === 2)     // clamped: round 2 cannot flip it
    assert(r2(5L) === 2)     // reached via 3
    // seeds never move
    assert(r2(1L) === 1 && r2(2L) === 2 && r2(4L) === 2)
  }

  test("exact tie with equal counts adopts the smallest label") {
    val g = edges((1L, 3L), (2L, 3L))
    val seeds = Seq((1L, 7), (2L, 4)).toDF("id", "label")
    val r = LabelProp.propagate(g, seeds, rounds = 1).as[(Long, Int)].collect().toMap
    assert(r(3L) === 4)
  }

  test("disconnected nodes stay unlabeled at any round count") {
    val g = edges((1L, 2L), (8L, 9L))
    val seeds = Seq((1L, 1)).toDF("id", "label")
    val r = LabelProp.propagate(g, seeds, rounds = 3).as[(Long, Int)].collect().toMap
    assert(r === Map(1L -> 1, 2L -> 1))
  }
}
