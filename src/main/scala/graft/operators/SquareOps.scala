package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tenant

/** The reference's per-entity transforms re-expressed as pure
  * DataFrame => DataFrame operators (SURVEY.md §2.3-§2.4). All built-in
  * Catalyst expressions — codegen + pushdown preserved; invalid rows are
  * filtered (never thrown, unlike the reference's per-row throw at
  * src/etl-square-payments.ts:30-32); money stays integral.
  */
object SquareOps {

  /** P3: constant-column injection (src/etl-square-payments.ts:100-103). */
  def withTenant(df: DataFrame, t: Tenant): DataFrame =
    df.select(
      lit(t.tenantId).as("tenant_id"),
      lit(t.provider).as("provider"),
      lit(t.providerAccountId).as("provider_account_id"),
      col("*"))

  /** P1: payment row projection (src/etl-square-payments.ts:27-47).
    * Struct-level coalesce total_money ?? amount_money; rows with neither
    * money field are dropped (reference throws per-row — engine rule:
    * filter + count, never fail the job).
    */
  def payments(src: DataFrame, t: Tenant): DataFrame = {
    val money = coalesce(col("total_money"), col("amount_money"))
    val projected = src
      .withColumn("raw_payload", to_json(struct(src.columns.map(col).toIndexedSeq: _*)))
      .withColumn("__money", money)
      .filter(col("__money").isNotNull && col("id").isNotNull)
      .select(
        col("id").as("payment_id"),
        col("order_id"),
        col("location_id"),
        to_timestamp(col("created_at")).as("created_at"),
        to_timestamp(col("updated_at")).as("updated_at"),
        col("__money.amount").as("amount"),
        col("__money.currency").as("currency"),
        col("status"),
        col("customer_id"),
        col("reference_id"),
        col("raw_payload"))
    withTenant(projected, t)
  }

  /** J1: deterministic first-payment-per-order pairing
    * (src/etl-square-orders.ts:181-193). The reference relies on
    * insertion order of an ASC-sorted scan; re-expressed as a window over
    * (created_at, payment_id) — order-stable under repartitioning, which
    * dropDuplicates is not.
    */
  def firstPaymentPerOrder(payments: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("order_id"))
      .orderBy(col("created_at"), col("payment_id"))
    payments
      .filter(col("order_id").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("order_id"), col("payment_id"))
  }

  /** J2 + P4 + P5: orders ⋈ payments flatten to line items
    * (src/etl-square-orders.ts:48-90, 197-213).
    *   - inner join on order_id = the reference's skip-missing-order (404)
    *     semantics;
    *   - explode drops null/empty line_items arrays (:202-205);
    *   - uid null → line dropped (:54-59);
    *   - quantity parseFloat, non-finite or <= 0 → dropped (:61-68);
    *   - currency coalesced base → total → null (:72-74);
    *   - sku left null by the reference (:82, "fill later from Catalog") —
    *     [[withSkuFromCatalog]] actually implements that stubbed join.
    */
  def orderItems(orders: DataFrame, payments: DataFrame, t: Tenant): DataFrame = {
    val keyed = firstPaymentPerOrder(payments)
    val flattened = orders
      .join(keyed, orders("id") === keyed("order_id"), "inner")
      .select(
        col("order_id"),
        col("payment_id"),
        col("location_id"),
        explode(col("line_items")).as("li"))
    val quantity = expr("try_cast(li.quantity AS DOUBLE)") // ANSI-safe: garbage -> NULL -> filtered
    val projected = flattened
      .withColumn("raw_payload", to_json(col("li")))
      .filter(col("li.uid").isNotNull)
      .withColumn("quantity", quantity)
      .filter(col("quantity").isNotNull && col("quantity") > 0)
      .select(
        col("order_id"),
        col("payment_id"),
        col("li.uid").as("line_item_uid"),
        col("li.catalog_object_id").as("catalog_object_id"),
        col("li.name").as("item_name"),
        lit(null).cast("string").as("sku"),
        col("quantity"),
        col("li.base_price_money.amount").as("base_price_amount"),
        col("li.total_money.amount").as("total_money_amount"),
        coalesce(col("li.base_price_money.currency"), col("li.total_money.currency")).as("currency"),
        col("location_id"),
        col("raw_payload"))
    withTenant(projected, t)
  }

  /** The sku join the reference stubbed (src/etl-square-orders.ts:82):
    * order items ⋈ catalog variations on catalog_object_id, broadcast
    * dimension side. */
  def withSkuFromCatalog(orderItems: DataFrame, catalogRows: DataFrame): DataFrame = {
    val dim = catalogRows.select(
      col("catalog_object_id").as("__cat_id"), col("sku").as("__cat_sku"))
    orderItems.drop("sku")
      .join(broadcast(dim), col("catalog_object_id") === col("__cat_id"), "left")
      .withColumn("sku", col("__cat_sku"))
      .drop("__cat_id", "__cat_sku")
  }

  /** J3 + P6 + P7: variation ⋈ parent-item lookup
    * (src/etl-square-catalog.ts:31-59, 134-168). One scan split by type;
    * ITEM side is the build/broadcast side; missing parent → null fields
    * (left join). item_name = parent name ?? variation name ?? null;
    * category = first element of the parent's categories array (:143 —
    * ordinal ignored, like the reference).
    */
  def catalogRows(catalogObjects: DataFrame, t: Tenant): DataFrame = {
    val items = catalogObjects
      .filter(col("type") === "ITEM")
      .select(
        col("id").as("__item_id"),
        col("item_data.name").as("__parent_name"),
        try_element_at(col("item_data.categories"), lit(1)).getField("id").as("__parent_category_id"))
    val variations = catalogObjects
      .filter(col("type") === "ITEM_VARIATION" && col("id").isNotNull)
      .withColumn("raw_payload",
        to_json(struct(catalogObjects.columns.map(col).toIndexedSeq: _*)))
    val projected = variations
      .join(broadcast(items), col("item_variation_data.item_id") === col("__item_id"), "left")
      .select(
        col("id").as("catalog_object_id"),
        col("type").as("object_type"),
        coalesce(col("__parent_name"), col("item_variation_data.name")).as("item_name"),
        col("item_variation_data.name").as("variation_name"),
        col("item_variation_data.sku").as("sku"),
        col("__parent_category_id").as("category_id"),
        coalesce(col("is_deleted"), lit(false)).as("is_deleted"),
        col("raw_payload"))
    withTenant(projected, t)
  }

  /** P8: inventory cast + timestamp parse + state default
    * (src/etl-square-inventory.ts:30-60). Unlike order items, zero and
    * negative quantities are KEPT (:38-45); only non-numeric is dropped.
    */
  def inventoryRows(src: DataFrame, t: Tenant): DataFrame = {
    val projected = src
      .withColumn("raw_payload", to_json(struct(src.columns.map(col).toIndexedSeq: _*)))
      .filter(col("catalog_object_id").isNotNull)
      .withColumn("quantity", expr("try_cast(quantity AS DOUBLE)"))
      .filter(col("quantity").isNotNull)
      .select(
        col("catalog_object_id"),
        col("catalog_object_type"),
        col("location_id"),
        coalesce(col("state"), lit("UNKNOWN")).as("state"),
        col("quantity"),
        to_timestamp(col("calculated_at")).as("calculated_at"),
        col("raw_payload"))
    withTenant(projected, t)
  }

  /** P9: category projection + defaults (src/etl-square-categories.ts:29-53):
    * name ?? "Unknown Category"; is_top_level ?? true; parent_category_id
    * hardcoded null (the reference never recurses, :43).
    */
  def categoryRows(src: DataFrame, t: Tenant): DataFrame = {
    val projected = src
      .withColumn("raw_payload", to_json(struct(src.columns.map(col).toIndexedSeq: _*)))
      .filter(col("id").isNotNull)
      .select(
        col("id").as("category_id"),
        coalesce(col("category_data.name"), lit("Unknown Category")).as("category_name"),
        lit(null).cast("string").as("parent_category_id"),
        coalesce(col("category_data.is_top_level"), lit(true)).as("is_top_level"),
        coalesce(col("is_deleted"), lit(false)).as("is_deleted"),
        col("raw_payload"))
    withTenant(projected, t)
  }

  /** P10: location projection; id or name missing → row dropped; address
    * is a null-skipping ", "-join, all-null → null
    * (src/etl-square-locations.ts:29-53). concat_ws skips nulls exactly
    * like the reference's filter(Boolean).join.
    */
  def locationRows(src: DataFrame, t: Tenant): DataFrame = {
    val addr = concat_ws(", ",
      col("address.address_line_1"),
      col("address.locality"),
      col("address.administrative_district_level_1"),
      col("address.postal_code"))
    val projected = src
      .withColumn("raw_payload", to_json(struct(src.columns.map(col).toIndexedSeq: _*)))
      .filter(col("id").isNotNull && col("name").isNotNull)
      .select(
        col("id").as("location_id"),
        col("name").as("location_name"),
        when(length(addr) > 0, addr).as("address"),
        col("timezone"),
        col("status"),
        col("raw_payload"))
    withTenant(projected, t)
  }
}
