package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.model.Tenant
import graft.operators.SquareOps
import graft.pipeline.{SquarePipelines, TimeWindow}
import graft.sources.JsonlSquareSource

/** Golden/edge-case coverage of the six Square pipelines over the JSONL
  * fixtures (FIXTURES.md). Each assertion cites the reference behavior
  * it preserves.
  */
class SquarePipelineSpec extends SparkSpec {

  private val fixtures = getClass.getResource("/fixtures/square").getPath
  private val source = new JsonlSquareSource(fixtures)
  private val tenant = Tenant()

  private def freshPipelines() = new SquarePipelines(
    source, Files.createTempDirectory("graft-sq").toString, tenant)

  test("payments: coalesce prefers total_money; both-missing dropped; nulls defaulted") {
    val rows = SquareOps.payments(source.payments(spark), tenant)
    val byId = rows.collect().map(r => r.getAs[String]("payment_id") -> r).toMap
    // pay-4 has no money fields → dropped, not thrown (ref throws: etl-square-payments.ts:30-32)
    assert(!byId.contains("pay-4"))
    assert(byId.size === 5)
    // total_money preferred over amount_money (:29)
    assert(byId("pay-1").getAs[Long]("amount") === 550L)
    // amount_money fallback
    assert(byId("pay-2").getAs[Long]("amount") === 200L)
    // constant columns stamped (:100-103)
    assert(byId("pay-1").getAs[String]("tenant_id") === "t-test")
    assert(byId("pay-1").getAs[String]("provider") === "square")
    // nullable defaulting (:36-43)
    assert(byId("pay-3").getAs[String]("customer_id") === null)
    // raw_payload lineage column present and JSON (:45)
    assert(byId("pay-1").getAs[String]("raw_payload").contains("\"pay-1\""))
  }

  test("order items: first-wins pairing, 404 drop, empty-array drop, quantity validation") {
    val items = SquareOps.orderItems(
      source.orders(spark), SquareOps.payments(source.payments(spark), tenant), tenant)
    val rows = items.collect()
    val byUid = rows.map(r => r.getAs[String]("line_item_uid") -> r).toMap
    // ord-1 has 7 line items: li-1 (qty 2) and li-2 (qty 2.5) survive;
    // no-uid, "abc", "0", "-1", "" are dropped (etl-square-orders.ts:54-68)
    assert(byUid.keySet === Set("li-1", "li-2", "li-8"))
    assert(byUid("li-2").getAs[Double]("quantity") === 2.5)
    // first payment per order by created_at wins: ord-1 has pay-1@10:00 and
    // pay-2@11:00 → pay-1 (etl-square-orders.ts:181-193 + ASC sort square.ts:55)
    assert(byUid("li-1").getAs[String]("payment_id") === "pay-1")
    // ord-404 referenced by pay-5 doesn't exist → no rows (404 tolerance via
    // inner join, square.ts:137-140); ord-3 has empty line_items → dropped
    // (:202-205); ord-9 has no payment → dropped (keyed from payments scan)
    assert(!rows.exists(_.getAs[String]("order_id") == "ord-3"))
    assert(!rows.exists(_.getAs[String]("order_id") == "ord-9"))
    // currency coalesce base → total (:72-74)
    assert(byUid("li-2").getAs[String]("currency") === "USD")
    // sku stubbed null by reference (:82)
    assert(byUid("li-1").getAs[String]("sku") === null)
  }

  test("order items: sku join fills the reference's stubbed column") {
    val items = SquareOps.orderItems(
      source.orders(spark), SquareOps.payments(source.payments(spark), tenant), tenant)
    val cat = SquareOps.catalogRows(source.catalogObjects(spark), tenant)
    val withSku = SquareOps.withSkuFromCatalog(items, cat)
    val byUid = withSku.collect().map(r => r.getAs[String]("line_item_uid") -> r).toMap
    assert(byUid("li-1").getAs[String]("sku") === "ESP-1")
    assert(byUid("li-2").getAs[String]("sku") === "CRO-1")
    // li-8 points at var-dangling (not in catalog) → sku stays null
    assert(byUid("li-8").getAs[String]("sku") === null)
  }

  test("catalog: parent lookup, name fallback, first-category, deleted normalize") {
    val rows = SquareOps.catalogRows(source.catalogObjects(spark), tenant)
    val byId = rows.collect().map(r => r.getAs[String]("catalog_object_id") -> r).toMap
    // only variations become rows (items are the build side)
    assert(byId.keySet === Set("var-1", "var-2", "var-3", "var-4", "var-5"))
    // parent name wins over variation name (etl-square-catalog.ts:47-48)
    assert(byId("var-1").getAs[String]("item_name") === "Espresso Drinks")
    assert(byId("var-1").getAs[String]("variation_name") === "Single Shot")
    // category = FIRST array element's id, ordinal ignored (:143)
    assert(byId("var-1").getAs[String]("category_id") === "cat-1")
    // parent with empty categories array → null category
    assert(byId("var-2").getAs[String]("category_id") === null)
    // no variation name + named parent → parent name; is_deleted === true normalize (:41)
    assert(byId("var-3").getAs[String]("item_name") === "Espresso Drinks")
    assert(byId("var-3").getAs[Boolean]("is_deleted") === true)
    assert(byId("var-1").getAs[Boolean]("is_deleted") === false)
    // dangling parent link → null parent fields, row kept (:159-161)
    assert(byId("var-4").getAs[String]("item_name") === "Dangling")
    assert(byId("var-4").getAs[String]("category_id") === null)
    // missing item_id entirely → fallback to variation name
    assert(byId("var-5").getAs[String]("item_name") === "NoParentLink")
  }

  test("inventory: zero/negative kept, garbage dropped, state default, ts parse") {
    val rows = SquareOps.inventoryRows(source.inventoryCounts(spark), tenant)
    val collected = rows.collect()
    // "oops" quantity dropped; missing catalog_object_id dropped (etl-square-inventory.ts:33-45)
    assert(collected.length === 4)
    val q = collected.map(r =>
      (r.getAs[String]("catalog_object_id"), r.getAs[String]("state")) -> r.getAs[Double]("quantity")).toMap
    // 0 and negative KEPT (unlike order items — :38-45)
    assert(q(("var-2", "IN_STOCK")) === 0.0)
    assert(q(("var-3", "UNKNOWN")) === -3.0)
    // state null → "UNKNOWN" (:55); calculated_at parsed to timestamp (:47-49)
    assert(collected.forall(_.getAs[java.sql.Timestamp]("calculated_at") != null))
  }

  test("categories: defaults and hardcoded-null parent") {
    val rows = SquareOps.categoryRows(source.categories(spark), tenant)
    val byId = rows.collect().map(r => r.getAs[String]("category_id") -> r).toMap
    assert(byId("cat-2").getAs[String]("category_name") === "Unknown Category") // :38
    assert(byId("cat-3").getAs[Boolean]("is_top_level") === true)               // :39
    assert(byId.values.forall(_.getAs[String]("parent_category_id") == null))   // :43
  }

  test("locations: id/name filter, null-skipping concat, empty address → null") {
    val rows = SquareOps.locationRows(source.locations(spark), tenant)
    val byId = rows.collect().map(r => r.getAs[String]("location_id") -> r).toMap
    // loc-4 (no name) and NoId dropped (etl-square-locations.ts:30-33)
    assert(byId.keySet === Set("loc-1", "loc-2", "loc-3"))
    assert(byId("loc-1").getAs[String]("address") === "1 Main St, Springfield, IL, 62701")
    // partial address: nulls skipped, not empty-joined (:36-43)
    assert(byId("loc-2").getAs[String]("address") === "Terminal 2, 62702")
    // all-null address → null (:42)
    assert(byId("loc-3").getAs[String]("address") === null)
  }

  test("end-to-end: runAll twice is idempotent (at-least-once ⇒ effectively-once)") {
    val p = freshPipelines()
    p.runAll(spark)
    p.runAll(spark) // rerun = reprocess same window
    // stable row counts and key-uniqueness after the second run
    def tbl(n: String) = spark.read.parquet(s"${p.warehouseDir}/$n")
    assert(tbl("pos_payments").count() === 5)
    assert(tbl("pos_order_items").count() === 3)
    assert(tbl("pos_catalog").count() === 5)
    assert(tbl("pos_inventory").count() === 4)
    assert(tbl("pos_categories").count() === 3)
    assert(tbl("pos_locations").count() === 3)
    assert(tbl("pos_payments").select("payment_id").distinct().count() === 5)
  }

  test("incremental window: overlapping reruns converge to the same table") {
    val p = freshPipelines()
    // run 1 covers only Feb (pay-6); run 2 covers Mar (rest) with overlap
    p.runPayments(spark, Some(TimeWindow("2024-02-01T00:00:00Z", "2024-03-01T10:30:00Z")))
    p.runPayments(spark, Some(TimeWindow("2024-02-15T00:00:00Z", "2024-03-02T00:00:00Z")))
    val tbl = spark.read.parquet(s"${p.warehouseDir}/pos_payments")
    assert(tbl.count() === 5)
    assert(tbl.select("payment_id").distinct().count() === 5)
  }
}
