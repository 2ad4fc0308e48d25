package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiler: per-column non-null count, exact distinct
  * count, and min/max (as strings), computed as a SINGLE aggregate over
  * the table (no per-column scans) and then unpivoted. The data-quality
  * primitive of a corpus pipeline — run it on every ingested table and
  * diff across runs.
  *
  * Scale: one shuffle-free partial-aggregate pass per partition + one
  * final reduce; exact distinct counts use count(DISTINCT) per column,
  * planned by Catalyst as an expand + two-phase aggregate. Swap
  * [[approxProfile]] in when exactness isn't worth the expand at 100 TB.
  */
object Profiler {

  private def perColumn(c: String): Seq[Column] = Seq(
    count(col(c)).as(s"${c}__n"),
    countDistinct(col(c)).as(s"${c}__d"),
    min(col(c)).cast("string").as(s"${c}__min"),
    max(col(c)).cast("string").as(s"${c}__max"))

  private def build(df: DataFrame, distinctExpr: String => Column): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      distinctExpr(c).as(s"${c}__d"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("column"),
      col(s"${c}__n").as("n_nonnull"),
      col(s"${c}__d").as("n_distinct"),
      col(s"${c}__min").as("min_val"),
      col(s"${c}__max").as("max_val")))
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Exact profile (count-distinct per column). */
  def profile(df: DataFrame): DataFrame =
    build(df, c => countDistinct(col(c)))

  /** HLL-based profile for very wide/large tables. */
  def approxProfile(df: DataFrame): DataFrame =
    build(df, c => approx_count_distinct(col(c)))
}
