package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.Tenant
import graft.operators.{SquareOps, Upsert}

/** The reference's payments ETL (scan → transform → ON-CONFLICT upsert;
  * src/etl-square-payments.ts end to end) as ONE incremental Structured
  * Streaming job over the paged feed:
  *
  *   - source: the DSv2 paged connector in micro-batch mode — each run
  *     picks up exactly the pages appended since the last checkpointed
  *     offset (local dir or HTTP feed, 429-retried);
  *   - transform: the SAME pure `SquareOps.payments` used by the batch
  *     pipeline — one transform definition serves both execution modes;
  *   - sink: `foreachBatch` keyed parquet upsert — at-least-once batch
  *     delivery × keyed idempotent merge = effectively-once table, the
  *     streaming analog of the reference's ON CONFLICT loader.
  *
  * `Trigger.AvailableNow` makes this the cron-run shape (drain all new
  * pages, then stop); remove the trigger for a continuously-running
  * ingest of the same code.
  */
object SquareFeedStream {

  def paymentsStream(
      spark: SparkSession,
      feedDir: String,
      tablePath: String,
      checkpointDir: String,
      tenant: Tenant = Tenant(),
      headers: Map[String, String] = Map.empty): StreamingQuery = {
    val reader = spark.readStream
      .format("graft.sources.dsv2.PagedJsonSource")
      .schema(graft.model.SquareSchemas.payment)
      .option("path", feedDir)
    headers.foreach { case (k, v) => reader.option(s"header.$k", v) }
    reader.load()
      .transform(src => SquareOps.payments(src, tenant))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Upsert.upsertParquet(spark, tablePath, batch,
          Seq("tenant_id", "provider", "payment_id"))
      }
      .start()
  }
}
