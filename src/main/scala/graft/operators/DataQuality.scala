package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (Deequ-style), compiled into as
  * few passes as the checks allow.
  *
  * Design for 100 TB: every ROW-LOCAL check against a table folds into
  * ONE aggregate projection over a single scan — `count(*)` is computed
  * once and shared as the denominator, each rule adds one
  * `count(when(cond))` column to the same partial-aggregated job, and the
  * per-rule columns are unpivoted driver-free with `stack`. A 50-rule
  * suite therefore costs exactly one table read, not 50 validation jobs.
  * Cross-row checks keep their minimal distributed shape: uniqueness is
  * one partial-aggregated count-distinct; referential integrity is one
  * LEFT SEMI join against the referenced side reduced to DISTINCT keys
  * first (small → AQE broadcasts it; the fact side never shuffles twice).
  *
  * Verdicts are exact-integer arithmetic: each check emits
  * `(chk, metric, denom, pass)` with `pass = metric*100 >= denom*minPct`
  * — no float or decimal division anywhere, so an external SQL engine
  * reproduces every verdict bit-for-bit (the dq1 oracle does).
  *
  * Reference anchor: the reference validates feed rows ad hoc inside each
  * transform (e.g. /root/reference/src/etl-square-orders.ts money/qty
  * guards); this operator lifts those row guards into a declarative,
  * one-scan, auditable report.
  */
object DataQuality {

  /** One row-local rule: passes when at least `minPct` percent of rows
    * satisfy `cond` (rows where `cond` evaluates to NULL count as
    * failures, matching SQL `count(*) FILTER (WHERE cond)`).
    */
  final case class RowCheck(chk: String, cond: Column, minPct: Int) {
    require(minPct >= 0 && minPct <= 100, s"minPct out of range: $minPct")
  }

  def notNull(c: String, minPct: Int = 100): RowCheck =
    RowCheck(s"not_null($c)", col(c).isNotNull, minPct)

  def inRange(c: String, lo: Double, hi: Double, minPct: Int = 100): RowCheck =
    RowCheck(s"in_range($c)", col(c) >= lo && col(c) <= hi, minPct)

  def accepted(c: String, values: Seq[String], minPct: Int = 100): RowCheck =
    RowCheck(s"accepted($c)", col(c).isin(values: _*), minPct)

  def matches(c: String, regex: String, minPct: Int = 100): RowCheck =
    RowCheck(s"matches($c)", col(c).rlike(regex), minPct)

  /** All row-local checks evaluated in ONE aggregate over one scan.
    * Output: (chk, metric, denom, pass) — one row per check.
    */
  def validateRows(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = count(lit(1)).as("denom") +:
      checks.zipWithIndex.map { case (c, i) => count(when(c.cond, 1)).as(s"m$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.chk.replace("'", "''")}', m$i, ${c.minPct}L" }
      .mkString(", ")
    one
      .select(col("denom"),
        expr(s"stack(${checks.size}, $stackArgs) AS (chk, metric, min_pct)"))
      .select(col("chk"), col("metric"), col("denom"), verdict)
  }

  /** Key-uniqueness check: one partial-aggregated exact count-distinct.
    * minPct defaults to 100 (no duplicate keys tolerated).
    */
  def unique(df: DataFrame, keyCols: Seq[String], minPct: Int = 100): DataFrame = {
    require(keyCols.nonEmpty, "no key columns given")
    df.agg(
        count(lit(1)).as("denom"),
        countDistinct(col(keyCols.head), keyCols.tail.map(col): _*).as("metric"))
      .select(
        lit(s"unique(${keyCols.mkString(",")})").as("chk"),
        col("metric"), col("denom"), lit(minPct.toLong).as("min_pct"))
      .select(col("chk"), col("metric"), col("denom"), verdict)
  }

  /** Referential integrity: the fraction of `fact` rows whose `fk` value
    * exists in `dim.pk`. The dim side is reduced to DISTINCT keys before
    * the LEFT SEMI join (keys are small → AQE broadcasts); the fact side
    * is scanned twice but never shuffled on a wide row.
    */
  def refIntegrity(
      fact: DataFrame, fk: String,
      dim: DataFrame, pk: String,
      minPct: Int = 100): DataFrame = {
    val keys = dim.select(col(pk)).distinct()
    val hits = fact
      .join(keys, fact(fk) === keys(pk), "left_semi")
      .agg(count(lit(1)).as("metric"))
    fact.agg(count(lit(1)).as("denom"))
      .crossJoin(hits) // 1 row × 1 row
      .select(
        lit(s"ref_integrity($fk)").as("chk"),
        col("metric"), col("denom"), lit(minPct.toLong).as("min_pct"))
      .select(col("chk"), col("metric"), col("denom"), verdict)
  }

  /** pass = metric*100 >= denom*min_pct — integer-exact on both engines. */
  private def verdict: Column =
    (col("metric") * lit(100L) >= col("denom") * col("min_pct")).as("pass")
}
