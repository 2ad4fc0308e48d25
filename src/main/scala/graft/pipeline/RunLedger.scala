package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Run bookkeeping for incremental pipelines (SURVEY.md §7.1): one
  * append-only ledger records each (pipeline, window) run with its row
  * count and status. `alreadyCompleted` lets an orchestrator skip
  * re-running a window that previously committed — while the keyed
  * upsert sink keeps accidental re-runs harmless (idempotent), the
  * ledger makes them avoidable.
  *
  * Concurrency: each record is ONE immutable JSON file named by a random
  * `run_id` — an atomic create, so concurrent orchestrators can never
  * collide or clobber each other. (The previous design was doubly racy:
  * `run_seq = count()` handed simultaneous runs the same sequence
  * number, and concurrent Spark parquet APPENDS to one directory share
  * a `_temporary` staging dir and can drop each other's rows entirely.
  * A one-row-per-run ledger has no business going through a Spark write
  * job at all.) Reads load the directory as JSON with a pinned schema.
  */
final class RunLedger(spark: SparkSession, path: String) {

  private val schema = StructType(Seq(
    StructField("pipeline", StringType),
    StructField("window_begin", StringType),
    StructField("window_end", StringType),
    StructField("rows", LongType),
    StructField("status", StringType),
    StructField("run_id", StringType),
    StructField("recorded_at", StringType)))

  private def fs = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  }

  private def exists: Boolean = fs.exists(new org.apache.hadoop.fs.Path(path))

  def record(pipeline: String, window: TimeWindow, rows: Long, status: String = "ok"): Unit = {
    val runId = java.util.UUID.randomUUID().toString
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("pipeline", pipeline)
    node.put("window_begin", window.beginIso)
    node.put("window_end", window.endIso)
    node.put("rows", rows)
    node.put("status", status)
    node.put("run_id", runId)
    node.put("recorded_at", java.time.Instant.now().toString)
    val dir = new org.apache.hadoop.fs.Path(path)
    fs.mkdirs(dir)
    val file = new org.apache.hadoop.fs.Path(dir, s"run-$runId.json")
    val out = fs.create(file, false) // atomic create; uuid name can't collide
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
  }

  /** All ledger entries (empty frame when no run ever recorded). */
  def entries: DataFrame =
    if (exists) spark.read.schema(schema).json(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def alreadyCompleted(pipeline: String, window: TimeWindow): Boolean =
    exists && {
      import org.apache.spark.sql.functions.col
      entries
        .filter(col("pipeline") === pipeline &&
          col("window_begin") === window.beginIso &&
          col("window_end") === window.endIso &&
          col("status") === "ok")
        .limit(1).count() > 0
    }
}
