package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Ivm

/** Delta-join IVM ≡ full recompute, folded over multiple increments,
  * including empty deltas and duplicate join keys (multiset semantics).
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("maintained view equals full recompute across three increments") {
    val rnd = new scala.util.Random(7)
    val a = (1 to 120).map(i => (rnd.nextInt(40).toLong, s"a$i", rnd.nextInt(3)))
      .toDF("k", "av", "aslice")
    val b = (1 to 150).map(i => (rnd.nextInt(40).toLong, s"b$i", rnd.nextInt(3)))
      .toDF("k", "bv", "bslice")
    val full = a.drop("aslice").join(b.drop("bslice"), Seq("k"))

    var aOld = a.filter($"aslice" === 0).drop("aslice")
    var bOld = b.filter($"bslice" === 0).drop("bslice")
    var view = aOld.join(bOld, Seq("k"))
    for (slice <- 1 to 2) {
      val dA = a.filter($"aslice" === slice).drop("aslice")
      val dB = b.filter($"bslice" === slice).drop("bslice")
      view = Ivm.maintain(view, aOld, dA, bOld, dB, Seq("k"))
      aOld = aOld.unionAll(dA)
      bOld = bOld.unionAll(dB)
    }
    assert(canon(view) === canon(full))
  }

  test("empty delta on either side is the identity refresh") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "av")
    val b = Seq((1L, "p"), (1L, "q")).toDF("k", "bv")
    val view = a.join(b, Seq("k"))
    val empty = a.filter($"k" < 0)
    val emptyB = b.filter($"k" < 0)
    assert(canon(Ivm.maintain(view, a, empty, b, emptyB, Seq("k"))) === canon(view))
  }

  test("duplicate keys keep multiset multiplicity (m×n pairs per key)") {
    val a = Seq((1L, "a1"), (1L, "a2")).toDF("k", "av")
    val dA = Seq((1L, "a3")).toDF("k", "av")
    val b = Seq((1L, "b1"), (1L, "b2")).toDF("k", "bv")
    val dB = Seq((1L, "b3")).toDF("k", "bv")
    val view = a.join(b, Seq("k"))
    val maintained = Ivm.maintain(view, a, dA, b, dB, Seq("k"))
    val fullJoin = a.unionAll(dA).join(b.unionAll(dB), Seq("k"))
    assert(maintained.count() === 9)
    assert(canon(maintained) === canon(fullJoin))
  }

  test("retractableAgg: deletes retract, updates shift sums, zero-count keys vanish") {
    // state: key 1 has 2 rows (sum 30), key 2 has 1 row (sum 50),
    // key 3 untouched (sum 7)
    val state = Seq((1L, 2L, 30L), (2L, 1L, 50L), (3L, 1L, 7L))
      .toDF("k", "cnt", "s")
    val cdc = Seq(
      (1L, "D", 0L, 10L),   // key 1 loses the 10-row → (1, 20)
      (1L, "U", 25L, 20L),  // remaining row repriced 20→25 → (1, 25)
      (2L, "D", 0L, 50L),   // key 2 fully retracted → gone
      (4L, "I", 9L, 0L))    // brand-new key appears
      .toDF("k", "op", "new_v", "old_v")
    val out = Ivm.retractableAgg(state, cdc, Seq("k"),
      opCol = "op", newCol = "new_v", oldCol = "old_v")
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 25L), (3L, 1L, 7L), (4L, 1L, 9L)),
      s"unexpected maintained aggregate: $out")
    // idempotence of the merge shape: applying an empty CDC is identity
    val empty = cdc.limit(0)
    val again = Ivm.retractableAgg(
      Seq((1L, 1L, 25L), (3L, 1L, 7L), (4L, 1L, 9L)).toDF("k", "cnt", "s"),
      empty, Seq("k"), "op", "new_v", "old_v")
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(again === out, "empty CDC must be the identity refresh")
  }
}
