package graft.model

import org.apache.spark.sql.types._

/** Explicit source schemas for the six Square-shaped entities — never
  * inferSchema in production paths (SURVEY.md §1.3). Field inventory
  * mirrors the reference's payload interfaces
  * (reference: src/square.ts:22-33, 95-108, 159-175, 237-244, 307-318,
  * 375-386); money is integer minor units + currency code and stays
  * integral end-to-end (src/square.ts:15-18 — never Double).
  */
object SquareSchemas {

  val money: StructType = StructType(Seq(
    StructField("amount", LongType),
    StructField("currency", StringType)))

  /** SquarePayment (src/square.ts:22-33). */
  val payment: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("location_id", StringType),
    StructField("order_id", StringType),
    StructField("status", StringType),
    StructField("customer_id", StringType),
    StructField("reference_id", StringType),
    StructField("amount_money", money),
    StructField("total_money", money)))

  val lineItem: StructType = StructType(Seq(
    StructField("uid", StringType),
    StructField("name", StringType),
    StructField("catalog_object_id", StringType),
    StructField("quantity", StringType), // numeric-string, validated at transform
    StructField("base_price_money", money),
    StructField("total_money", money)))

  /** SquareOrder + nested SquareLineItem[] (src/square.ts:95-108). */
  val order: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("location_id", StringType),
    StructField("line_items", ArrayType(lineItem))))

  /** SquareCatalogObject, types ITEM + ITEM_VARIATION (src/square.ts:159-175). */
  val catalogObject: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("is_deleted", BooleanType),
    StructField("item_data", StructType(Seq(
      StructField("name", StringType),
      StructField("categories", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("ordinal", LongType)))))))),
    StructField("item_variation_data", StructType(Seq(
      StructField("name", StringType),
      StructField("sku", StringType),
      StructField("item_id", StringType))))))

  /** SquareInventoryCount (src/square.ts:237-244). */
  val inventoryCount: StructType = StructType(Seq(
    StructField("catalog_object_id", StringType),
    StructField("catalog_object_type", StringType),
    StructField("state", StringType),
    StructField("location_id", StringType),
    StructField("quantity", StringType), // numeric-string; 0/negative allowed here
    StructField("calculated_at", StringType)))

  /** SquareCategoryObject (src/square.ts:307-318). */
  val category: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("is_deleted", BooleanType),
    StructField("category_data", StructType(Seq(
      StructField("name", StringType),
      StructField("is_top_level", BooleanType),
      StructField("parent_category", StructType(Seq(
        StructField("ordinal", LongType)))))))))

  /** SquareLocation (src/square.ts:375-386). */
  val location: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("address", StructType(Seq(
      StructField("address_line_1", StringType),
      StructField("locality", StringType),
      StructField("administrative_district_level_1", StringType),
      StructField("postal_code", StringType)))),
    StructField("timezone", StringType),
    StructField("status", StringType)))
}

/** Constant partition columns stamped on every row of every target table
  * (reference: src/etl-square-payments.ts:8-11,100-103) — also the
  * natural storage partitioning for multi-tenant layouts at scale.
  */
final case class Tenant(
    tenantId: String = "t-test",
    provider: String = "square",
    providerAccountId: String = "default-square")
