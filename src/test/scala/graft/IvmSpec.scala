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
}
