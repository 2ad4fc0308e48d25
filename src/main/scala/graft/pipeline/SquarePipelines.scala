package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tenant
import graft.operators.{SquareOps, Upsert}
import graft.sources.SquareSource

/** The six pipelines (SURVEY.md §3), each `scan → transform → keyed
  * upsert`. Transform stages are pure (graft.operators.SquareOps) and
  * testable without I/O; sinks are the idempotent keyed upsert (K1-K6,
  * SURVEY.md §2.2) onto parquet tables under `warehouseDir`.
  *
  * Upsert keys mirror the reference's ON CONFLICT clauses:
  *   pos_payments    (tenant_id, provider, payment_id)              [K1 :82]
  *   pos_order_items (tenant_id, provider, order_id, line_item_uid) [K2 :127]
  *   pos_catalog     (tenant, provider, account, catalog_object_id) [K3 :91]
  *   pos_inventory   (… catalog_object_id, location_id, state)      [K4 :91]
  *   pos_categories  (… category_id)                                [K5 :82]
  *   pos_locations   (… location_id)                                [K6 :82]
  *
  * K4-K6 stamp an `updated_at` audit column at write time (reference sets
  * `updated_at = CURRENT_TIMESTAMP` on update).
  */
final class SquarePipelines(
    source: SquareSource,
    val warehouseDir: String,
    tenant: Tenant = Tenant()) {

  private def table(name: String): String = s"$warehouseDir/$name"

  def runPayments(spark: SparkSession, window: Option[TimeWindow] = None): DataFrame = {
    val src = window.fold(source.payments(spark))(w => w.filter(source.payments(spark), "created_at"))
    val rows = SquareOps.payments(src, tenant)
    Upsert.upsertParquet(spark, table("pos_payments"), rows,
      Seq("tenant_id", "provider", "payment_id"))
    spark.read.parquet(table("pos_payments"))
  }

  def runOrderItems(spark: SparkSession, window: Option[TimeWindow] = None): DataFrame = {
    val pay = window.fold(source.payments(spark))(w => w.filter(source.payments(spark), "created_at"))
    val payRows = SquareOps.payments(pay, tenant)
    val rows = SquareOps.orderItems(source.orders(spark), payRows, tenant)
    Upsert.upsertParquet(spark, table("pos_order_items"), rows,
      Seq("tenant_id", "provider", "order_id", "line_item_uid"))
    spark.read.parquet(table("pos_order_items"))
  }

  def runCatalog(spark: SparkSession): DataFrame = {
    val rows = SquareOps.catalogRows(source.catalogObjects(spark), tenant)
    Upsert.upsertParquet(spark, table("pos_catalog"), rows,
      Seq("tenant_id", "provider", "provider_account_id", "catalog_object_id"))
    spark.read.parquet(table("pos_catalog"))
  }

  def runInventory(spark: SparkSession): DataFrame = {
    val rows = SquareOps.inventoryRows(source.inventoryCounts(spark), tenant)
      .withColumn("updated_at", current_timestamp())
    Upsert.upsertParquet(spark, table("pos_inventory"), rows,
      Seq("tenant_id", "provider", "provider_account_id",
        "catalog_object_id", "location_id", "state"))
    spark.read.parquet(table("pos_inventory"))
  }

  def runCategories(spark: SparkSession): DataFrame = {
    val rows = SquareOps.categoryRows(source.categories(spark), tenant)
      .withColumn("updated_at", current_timestamp())
    Upsert.upsertParquet(spark, table("pos_categories"), rows,
      Seq("tenant_id", "provider", "provider_account_id", "category_id"))
    spark.read.parquet(table("pos_categories"))
  }

  def runLocations(spark: SparkSession): DataFrame = {
    val rows = SquareOps.locationRows(source.locations(spark), tenant)
      .withColumn("updated_at", current_timestamp())
    Upsert.upsertParquet(spark, table("pos_locations"), rows,
      Seq("tenant_id", "provider", "provider_account_id", "location_id"))
    spark.read.parquet(table("pos_locations"))
  }

  /** The full hourly run, in an order that (unlike the reference's
    * workflow, SURVEY.md §3 trace note) lands catalog before order items
    * so the sku join could be satisfied.
    */
  def runAll(spark: SparkSession, window: Option[TimeWindow] = None): Unit = {
    runPayments(spark, window)
    runCatalog(spark)
    runOrderItems(spark, window)
    runInventory(spark)
    runCategories(spark)
    runLocations(spark)
  }
}

/** P2: the incremental lookback window (SURVEY.md §2.3 P2 / §2.7;
  * reference: src/etl-square-payments.ts:12,18-25). Overlapping windows
  * across runs are intended — the keyed upsert makes reprocessing
  * idempotent (at-least-once extract ⇒ effectively-once tables). The
  * lookback is the batch analog of a watermark / allowed lateness.
  */
final case class TimeWindow(beginIso: String, endIso: String) {
  def filter(df: DataFrame, tsCol: String): DataFrame =
    df.filter(to_timestamp(col(tsCol)).between(
      to_timestamp(lit(beginIso)), to_timestamp(lit(endIso))))
}

object TimeWindow {
  /** now − lookbackHours .. now, matching getTimeWindow (:18-25). */
  def lookback(nowEpochMs: Long, lookbackHours: Int = 24): TimeWindow = {
    val fmt = java.time.format.DateTimeFormatter.ISO_INSTANT
    TimeWindow(
      fmt.format(java.time.Instant.ofEpochMilli(nowEpochMs - lookbackHours * 3600L * 1000)),
      fmt.format(java.time.Instant.ofEpochMilli(nowEpochMs)))
  }
}
