package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Run bookkeeping for incremental pipelines (SURVEY.md §7.1): one
  * append-only parquet ledger records each (pipeline, window) run with
  * its row count and status. `alreadyCompleted` lets an orchestrator
  * skip re-running a window that previously committed — while the keyed
  * upsert sink keeps accidental re-runs harmless (idempotent), the
  * ledger makes them avoidable.
  */
final class RunLedger(spark: SparkSession, path: String) {

  import spark.implicits._

  final case class Entry(
      pipeline: String, window_begin: String, window_end: String,
      rows: Long, status: String, run_seq: Long)

  private def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def record(pipeline: String, window: TimeWindow, rows: Long, status: String = "ok"): Unit = {
    val seq = if (exists) spark.read.parquet(path).count() else 0L
    Seq((pipeline, window.beginIso, window.endIso, rows, status, seq))
      .toDF("pipeline", "window_begin", "window_end", "rows", "status", "run_seq")
      .write.mode(SaveMode.Append).parquet(path)
  }

  def alreadyCompleted(pipeline: String, window: TimeWindow): Boolean =
    exists && {
      import org.apache.spark.sql.functions.col
      spark.read.parquet(path)
        .filter(col("pipeline") === pipeline &&
          col("window_begin") === window.beginIso &&
          col("window_end") === window.endIso &&
          col("status") === "ok")
        .limit(1).count() > 0
    }
}
