package graft

import org.apache.spark.sql.Row
import graft.operators.DataQuality

/** Unit semantics of the one-pass expectation compiler: NULL handling,
  * threshold arithmetic, uniqueness, referential integrity.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Boolean)] =
    df.collect().map { case Row(chk: String, m: Long, d: Long, p: Boolean) => chk -> ((m, d, p)) }.toMap

  test("row checks share one denominator and count NULL conditions as failures") {
    val df = Seq(
      (Some(1L), Some("O"), 10.0),
      (None, Some("F"), 20.0),
      (Some(3L), None, -5.0),
      (Some(4L), Some("X"), 30.0)).toDF("k", "status", "amt")
    val r = report(DataQuality.validateRows(df, Seq(
      DataQuality.notNull("k"),
      DataQuality.accepted("status", Seq("O", "F", "P")),
      DataQuality.inRange("amt", 0.0, 100.0, minPct = 75))))
    assert(r("not_null(k)") === ((3L, 4L, false)))
    // NULL status is neither accepted nor rejected by the predicate — it
    // must count as a failure, like SQL count(*) FILTER.
    assert(r("accepted(status)") === ((2L, 4L, false)))
    // 3/4 = exactly 75% passes at minPct=75 (>= is inclusive).
    assert(r("in_range(amt)") === ((3L, 4L, true)))
  }

  test("validateRows is a single aggregate over one scan (no per-rule jobs)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val plan = DataQuality.validateRows(df, Seq(
      DataQuality.notNull("k"), DataQuality.notNull("v"),
      DataQuality.matches("v", "^[ab]$")))
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size === 1, s"expected one Aggregate, got:\n$plan")
  }

  test("unique detects duplicate keys; composite keys supported") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val single = report(DataQuality.unique(df, Seq("k")))
    assert(single("unique(k)") === ((2L, 3L, false)))
    val composite = report(DataQuality.unique(df.dropDuplicates(), Seq("k", "v")))
    assert(composite("unique(k,v)") === ((2L, 2L, true)))
  }

  test("refIntegrity measures fk coverage against distinct dim keys") {
    val fact = Seq((1L, "x"), (2L, "y"), (9L, "z"), (9L, "w")).toDF("fk", "v")
    val dim = Seq((1L, "a"), (2L, "b"), (2L, "dup")).toDF("pk", "name")
    val r = report(DataQuality.refIntegrity(fact, "fk", dim, "pk"))
    assert(r("ref_integrity(fk)") === ((2L, 4L, false)))
    val lenient = report(DataQuality.refIntegrity(fact, "fk", dim, "pk", minPct = 50))
    assert(lenient("ref_integrity(fk)")._3 === true)
  }
}
