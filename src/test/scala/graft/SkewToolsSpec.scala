package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewTools

class SkewToolsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key distribution") {
    // 90% of big rows share one key — the classic hot-key shape
    val big = (1 to 1000).map(i => (if (i <= 900) 1 else i % 50 + 2, s"v$i")).toDF("k", "v")
    val small = (1 to 60).map(i => (i, s"dim$i")).toDF("k", "d")
    val plain = big.join(small, Seq("k")).select("k", "v", "d")
    val salted = SkewTools.saltedJoin(big, small, "k", salt = 8).select("k", "v", "d")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin left_outer keeps unmatched big rows exactly once") {
    val big = Seq((1, "a"), (2, "b"), (99, "nomatch")).toDF("k", "v")
    val small = Seq((1, "d1"), (2, "d2")).toDF("k", "d")
    val out = SkewTools.saltedJoin(big, small, "k", salt = 4, joinType = "left_outer")
    assert(out.count() === 3)
    assert(out.filter($"k" === 99 && $"d".isNull).count() === 1)
  }

  test("validate splits valid/rejected with null-safe predicate") {
    val df = Seq(("1", 1), ("x", 2), (null, 3)).toDF("q", "id")
    val s = SkewTools.validate(df, expr("try_cast(q AS INT)").isNotNull)
    assert(s.valid.select("id").as[Int].collect().toSet === Set(1))
    assert(s.rejected.select("id").as[Int].collect().toSet === Set(2, 3))
    // nothing lost, nothing duplicated
    assert(s.valid.count() + s.rejected.count() === df.count())
  }

  test("payments rejects are observable: both-money-missing rows land in the reject side") {
    val source = new graft.sources.JsonlSquareSource(
      getClass.getResource("/fixtures/square").getPath)
    val src = source.payments(spark)
    val s = SkewTools.validate(src,
      coalesce(col("total_money"), col("amount_money")).isNotNull && col("id").isNotNull)
    assert(s.rejected.select("id").as[String].collect().toSeq === Seq("pay-4"))
    assert(s.valid.count() === 5)
  }
}
