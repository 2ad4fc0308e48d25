package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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

  /** Maintain the aggregate state table at `path` from a micro-batched
    * stream. Merging is NOT idempotent (a replayed batch would double
    * count), so the state rows carry the id of the last folded batch —
    * the standard foreachBatch transactional-sink recipe: a batch with
    * id <= the stored watermark is a committed replay and is skipped;
    * the fold itself runs under the crash-safe staged swap, so the
    * batch-id watermark and the merged counts commit atomically
    * together. */
  def streamingFold(
      stream: DataFrame,
      path: String,
      key: Seq[String],
      value: Column,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fsPath = new org.apache.hadoop.fs.Path(path)
        val fs = fsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        Upsert.recoverSwap(fs, path)
        if (!fs.exists(fsPath))
          partials(batch, key, value).withColumn("last_batch", lit(batchId))
            .write.mode(SaveMode.Overwrite).parquet(path)
        else {
          val applied = s.read.parquet(path)
            .agg(max(col("last_batch"))).head().getLong(0)
          if (applied < batchId)
            Upsert.stagedRewrite(s, path)(base =>
              merge(base.drop("last_batch"), partials(batch, key, value))
                .withColumn("last_batch", lit(batchId)))
        }
        ()
      }
      .start()
}
