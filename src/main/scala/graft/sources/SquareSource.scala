package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.model.SquareSchemas

/** Entity scans S1-S6 (SURVEY.md §2.1).
  *
  * The engine-facing abstraction is "entity → DataFrame with the declared
  * schema". This implementation reads JSONL fixtures (the test/e2e path);
  * a production deployment would register a DataSource V2 TableProvider
  * that pages the Square REST API inside PartitionReaders with
  * time-window filter pushdown and 429 backoff (reference behavior:
  * src/square.ts:43-91 — cursor pagination, sort_order=ASC, 10s sleep on
  * 429). The crucial Spark-first inversion: the reference's per-order
  * point lookups (S2, src/square.ts:117-156, called in a loop from
  * src/etl-square-orders.ts:197-199) are NOT reproduced — orders are
  * scanned as a set once and joined (SURVEY.md §2.1 S2: the scalability
  * cliff of the reference).
  */
trait SquareSource {
  def payments(spark: SparkSession): DataFrame
  def orders(spark: SparkSession): DataFrame
  def catalogObjects(spark: SparkSession): DataFrame
  def inventoryCounts(spark: SparkSession): DataFrame
  def categories(spark: SparkSession): DataFrame
  def locations(spark: SparkSession): DataFrame
}

/** JSONL-backed source: one file per entity under `dir`, read PERMISSIVE
  * with the explicit schema (unknown fields tolerated, malformed rows
  * null-filled — SURVEY.md §1.3).
  */
final class JsonlSquareSource(dir: String) extends SquareSource {
  private def read(spark: SparkSession, name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(s"$dir/$name.jsonl")

  def payments(spark: SparkSession): DataFrame = read(spark, "payments", SquareSchemas.payment)
  def orders(spark: SparkSession): DataFrame = read(spark, "orders", SquareSchemas.order)
  def catalogObjects(spark: SparkSession): DataFrame = read(spark, "catalog", SquareSchemas.catalogObject)
  def inventoryCounts(spark: SparkSession): DataFrame = read(spark, "inventory", SquareSchemas.inventoryCount)
  def categories(spark: SparkSession): DataFrame = read(spark, "categories", SquareSchemas.category)
  def locations(spark: SparkSession): DataFrame = read(spark, "locations", SquareSchemas.location)
}
