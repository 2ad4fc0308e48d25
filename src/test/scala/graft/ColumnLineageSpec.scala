package graft

import org.apache.spark.sql.functions._
import graft.plans.ColumnLineage
import graft.plans.ColumnLineage.Source

/** Column-level lineage: every output column of a multi-operator plan
  * maps back to exactly the (source table, source column) pairs that
  * feed its VALUE (filter/join predicates don't contribute — the
  * standard value-lineage cut).
  */
class ColumnLineageSpec extends SparkSpec {

  private def li = Tables.lineitem(spark, sfDir)
  private def ord = Tables.orders(spark, sfDir)

  test("projection + aggregate over a join: per-column sources") {
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
    val lin = ColumnLineage.lineage(df)
    assert(lin("o_orderpriority") === Set(Source("orders.parquet", "o_orderpriority")))
    assert(lin("revenue") === Set(
      Source("lineitem.parquet", "l_extendedprice"),
      Source("lineitem.parquet", "l_discount")))
    assert(lin("n") === Set.empty)
  }

  test("window, explode, and union merge lineage through their operators") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey")).orderBy(col("l_extendedprice"))
    val windowed = li.select(col("l_orderkey"),
      row_number().over(w).as("rn"),
      (col("l_quantity") + lit(1)).as("q1"))
    val lw = ColumnLineage.lineage(windowed)
    assert(lw("rn") === Set(
      Source("lineitem.parquet", "l_orderkey"),
      Source("lineitem.parquet", "l_extendedprice")))
    assert(lw("q1") === Set(Source("lineitem.parquet", "l_quantity")))

    val exploded = li.select(col("l_orderkey"),
        explode(array(col("l_quantity"), col("l_discount"))).as("v"))
    assert(ColumnLineage.lineage(exploded)("v") === Set(
      Source("lineitem.parquet", "l_quantity"),
      Source("lineitem.parquet", "l_discount")))

    val unioned = li.select(col("l_extendedprice").as("x"))
      .union(ord.select(col("o_totalprice").as("x")))
    assert(ColumnLineage.lineage(unioned)("x") === Set(
      Source("lineitem.parquet", "l_extendedprice"),
      Source("orders.parquet", "o_totalprice")))
  }

  test("filters and join keys do not pollute value lineage") {
    val df = li.filter(col("l_returnflag") === "R")
      .join(ord.filter(col("o_orderstatus") =!= "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_quantity"))
    assert(ColumnLineage.lineage(df)("l_quantity")
      === Set(Source("lineitem.parquet", "l_quantity")))
  }

  test("impactOf: forward impact of a source column change") {
    val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_quantity").as("q"),
        (col("o_totalprice") * 2).as("double_price"),
        col("o_orderpriority"))
    assert(ColumnLineage.impactOf(df, "orders.parquet", "o_totalprice")
      === Set("double_price"))
    assert(ColumnLineage.impactOf(df, "orders.parquet", "o_orderkey") === Set.empty)
  }

  test("grouping sets (Expand) and registered-query smoke: lineage total") {
    val gs = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sq"))
    assert(ColumnLineage.lineage(gs)("sq")
      === Set(Source("lineitem.parquet", "l_quantity")))
    // every registered TPC-H shape query resolves without throwing
    Seq("a1_pricing_summary", "a3_nation_revenue", "q9_profit").foreach { n =>
      val lin = ColumnLineage.lineage(SparkEntry.queries(n)(spark, sfDir))
      assert(lin.nonEmpty)
      assert(lin.values.exists(_.nonEmpty), s"$n produced all-empty lineage")
    }
  }

  test("sensitiveReach: PII data-category map over a slice of the registry") {
    val sensitive = Set(
      Source("customer.parquet", "c_name"),
      Source("customer.parquet", "c_acctbal"))
    val names = Seq("a3_nation_revenue", "q10_returned_items",
      "q13_cust_distribution", "dq2_k_anonymity")
    val dfs = names.map(n => n -> SparkEntry.queries(n)(spark, sfDir)).toMap
    val reach = ColumnLineage.sensitiveReach(dfs, sensitive)
    assert(reach.keySet === names.toSet)
    // a3 (nation revenue) aggregates prices only — no PII reach
    assert(reach("a3_nation_revenue").isEmpty,
      s"a3 unexpectedly touches PII: ${reach("a3_nation_revenue")}")
    // q10 returns customer name and balance columns — both must surface
    val q10 = reach("q10_returned_items")
    assert(q10.values.flatten.toSet === sensitive,
      s"q10 must expose both sensitive sources, got $q10")
  }
}
