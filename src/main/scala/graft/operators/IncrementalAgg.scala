package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance: keep per-key
  * mergeable partials (count / exact decimal sum / min / max) as a
  * state table, fold new data in batch-by-batch, and derive the final
  * aggregates (including avg) at read time.
  *
  * This is the standard incremental-view-maintenance shape: each
  * increment costs one partial aggregation of the delta (map-side
  * combined before its single shuffle) plus a key-aligned merge with
  * state — never a rescan of history. Sums are exact DECIMAL so state
  * merging is order- and batching-independent (double accumulation
  * would drift between merge orders); avg is derived, not stored,
  * because avg partials don't merge.
  */
object IncrementalAgg {

  /** Partial state for one batch: (keys..., n, s, mn, mx). */
  def partials(df: DataFrame, key: Seq[String], value: Column): DataFrame =
    df.groupBy(key.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(value).as("s"),
        min(value).as("mn"),
        max(value).as("mx"))

  /** Merge two state tables (associative + commutative). */
  def merge(state: DataFrame, delta: DataFrame): DataFrame = {
    val key = state.columns.filterNot(Set("n", "s", "mn", "mx"))
    state.unionByName(delta)
      .groupBy(key.map(col).toIndexedSeq: _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("s")).as("s"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))
  }

  /** Read view over a state table: final aggregates incl. derived avg. */
  def finish(state: DataFrame): DataFrame =
    state.withColumn("avg", col("s").cast("double") / col("n"))
}
