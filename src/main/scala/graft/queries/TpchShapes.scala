package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables => T}

/** Canonical TPC-H-shaped analytics (adapted to the fixture schema) —
  * breadth for the "every query a user runs today" bar. All measure
  * arithmetic is exact-decimal; ratios are a single double division of
  * two exact sums (IEEE-identical across engines).
  */
object TpchShapes {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(4,2)")

  // --- q4_order_priority: EXISTS + count by priority (TPC-H Q4 shape) ---
  val q4OrderPriority = QueryDef.sql(
    "q4_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    val ord = T.orders(s, d).filter(
      col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1995-04-01")))
    val li = T.lineitem(s, d)
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") && li("l_shipdate") > ord("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  // --- q7_volume_shipping: revenue between two customer nations by year
  // (TPC-H Q7 shape, adapted: no supplier nation on lineitem here). The
  // fixture's nation names are NATION_0..24 — a real-world name filter
  // would match nothing and pass the oracle vacuously. ---
  val q7VolumeShipping = QueryDef.sql(
    "q7_volume_shipping",
    """SELECT n_name, year(l_shipdate) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_3', 'NATION_7')
      |  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
      |GROUP BY n_name, year(l_shipdate)""".stripMargin) { (s, d) =>
    val li = T.lineitem(s, d).filter(
      col("l_shipdate").between(to_timestamp(lit("1995-01-01")), to_timestamp(lit("1996-12-31"))))
    li.join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d).filter(col("n_name").isin("NATION_3", "NATION_7"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (one - col("l_discount").cast("decimal(4,2)")))
        .cast("double").as("volume"))
  }

  // --- q12_shipmode: CASE-bucketed counts (TPC-H Q12 shape, using
  // linestatus as the mode surrogate) ---
  val q12Shipmode = QueryDef.sql(
    "q12_shipmode",
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag""".stripMargin) { (s, d) =>
    val li = T.lineitem(s, d).filter(
      col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    T.orders(s, d).join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(!high, 1).otherwise(0)).as("low_line_count"))
  }

  // --- q14_promo_ratio: conditional-revenue ratio (TPC-H Q14 shape) —
  // 100 * promo / total as ONE double division of two exact decimal sums ---
  val q14PromoRatio = QueryDef.sql(
    "q14_promo_ratio",
    """SELECT CAST(100 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%%'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |    ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin
      .replace("%%", "%")) { (s, d) =>
    val li = T.lineitem(s, d).filter(
      col("l_shipdate") >= to_timestamp(lit("1995-09-01")) &&
        col("l_shipdate") < to_timestamp(lit("1995-10-01")))
    val rev = dec(col("l_extendedprice")) * (one - col("l_discount").cast("decimal(4,2)"))
    li.join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg((lit(100) * sum(when(col("p_type").like("PROMO%"), rev)
          .otherwise(lit(0).cast("decimal(16,4)"))).cast("double")
        / sum(rev).cast("double")).cast("double").as("promo_revenue"))
  }

  // --- q19_disjunctive: OR-of-ANDs predicate (TPC-H Q19 shape) — tests
  // disjunctive pushdown/CNF handling ---
  val q19Disjunctive = QueryDef.sql(
    "q19_disjunctive",
    """SELECT count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
      |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 40)
      |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)""".stripMargin) { (s, d) =>
    val cond =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) && col("l_quantity").between(1, 30)) ||
      (col("p_brand") === "Brand#22" && col("p_size").between(10, 30) && col("l_quantity").between(10, 40)) ||
      (col("p_brand") === "Brand#33" && col("p_size").between(20, 50) && col("l_quantity").between(20, 50))
    T.lineitem(s, d)
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(count(lit(1)).as("n"), sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
  }

  // --- q2_best_supplier: per-part best supplier by acctbal (TPC-H Q2
  // shape: correlated max → window max + equality filter) ---
  val q2BestSupplier = QueryDef.sql(
    "q2_best_supplier",
    """WITH links AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |ranked AS (
      |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
      |    max(s_acctbal) OVER (PARTITION BY p_partkey) AS best_bal
      |  FROM part
      |  JOIN links ON p_partkey = l_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE p_size <= 10)
      |SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
      |FROM ranked WHERE s_acctbal = best_bal""".stripMargin) { (s, d) =>
    // Semi-restrict the pair projection by the (broadcast) filtered part
    // set BEFORE the distinct: the distinct's shuffle then carries only
    // small-part pairs instead of every (partkey, suppkey) in lineitem —
    // the q17 pattern applied to q2's heaviest exchange.
    val smallParts = T.part(s, d).filter(col("p_size") <= 10).select(col("p_partkey"))
    val links = T.lineitem(s, d)
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val joined = T.part(s, d).filter(col("p_size") <= 10)
      .join(links, col("p_partkey") === col("l_partkey"))
      .join(T.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_partkey"))
    joined
      .withColumn("best_bal", max(col("s_acctbal")).over(w))
      .filter(col("s_acctbal") === col("best_bal"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"), col("s_acctbal"))
  }

  // --- q9_profit: profit by supplier nation and year (TPC-H Q9 shape;
  // cost surrogate = quantity × retail price, all exact decimal) ---
  val q9Profit = QueryDef.sql(
    "q9_profit",
    """SELECT n_name, year(l_shipdate) AS o_year,
      |  CAST(sum(
      |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |    - CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.01 AS DECIMAL(4,2))
      |  ) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name, year(l_shipdate)""".stripMargin) { (s, d) =>
    val rev = dec(col("l_extendedprice")) * (one - col("l_discount").cast("decimal(4,2)"))
    val cost = dec(col("l_quantity")) * dec(col("p_retailprice")) * lit(0.01).cast("decimal(4,2)")
    T.lineitem(s, d)
      .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(T.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
      .agg(sum(rev - cost).cast("double").as("profit"))
  }

  // --- q20_semi_chain: nested semi-join chain (TPC-H Q20 shape):
  // suppliers who shipped a 'b%'-named part in 1996 ---
  val q20SemiChain = QueryDef.sql(
    "q20_semi_chain",
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey
      |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |    AND EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_name LIKE 'b%'))""".stripMargin) { (s, d) =>
    val parts = T.part(s, d).filter(col("p_name").like("b%"))
    val li96 = T.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
    T.supplier(s, d)
      .join(li96, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  // --- q3_shipping_priority: top-10 unshipped-revenue orders (Q3) ---
  val q3ShippingPriority = QueryDef.sql(
    "q3_shipping_priority",
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-03-15' AND l_shipdate > TIMESTAMP '1996-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    val rev = dec(col("l_extendedprice")) * (one - col("l_discount").cast("decimal(4,2)"))
    T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(T.orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1996-03-15"))),
        col("c_custkey") === col("o_custkey"))
      .join(T.lineitem(s, d).filter(col("l_shipdate") > to_timestamp(lit("1996-03-15"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(rev).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // --- q5_local_supplier: revenue where customer and supplier share a
  // nation, by nation within one region (Q5) ---
  val q5LocalSupplier = QueryDef.sql(
    "q5_local_supplier",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin) { (s, d) =>
    val rev = dec(col("l_extendedprice")) * (one - col("l_discount").cast("decimal(4,2)"))
    T.customer(s, d)
      .join(T.orders(s, d).filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01"))),
        col("c_custkey") === col("o_custkey"))
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(rev).cast("double").as("revenue"))
  }

  // --- q6_forecast_revenue: single filter-aggregate (Q6) — the purest
  // pushdown test: every predicate must reach the parquet scan ---
  val q6ForecastRevenue = QueryDef.sql(
    "q6_forecast_revenue",
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
    T.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * col("l_discount").cast("decimal(4,2)"))
        .cast("double").as("revenue"))
  }

  // --- q8_market_share: one nation's share of regional revenue by year
  // (Q8 shape) — ratio of two exact sums per group ---
  val q8MarketShare = QueryDef.sql(
    "q8_market_share",
    """SELECT o_year,
      |  CAST(CAST(sum(CASE WHEN n_name = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
      |    / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT year(o_orderdate) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
      |    n_name
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01') t
      |GROUP BY o_year""".stripMargin) { (s, d) =>
    val vol = dec(col("l_extendedprice")) * (one - col("l_discount").cast("decimal(4,2)"))
    val base = T.lineitem(s, d)
      .join(T.orders(s, d).filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(year(col("o_orderdate")).as("o_year"), vol.as("volume"), col("n_name"))
    base.groupBy(col("o_year"))
      .agg((sum(when(col("n_name") === "NATION_3", col("volume"))
          .otherwise(lit(0).cast("decimal(16,4)"))).cast("double")
        / sum(col("volume")).cast("double")).cast("double").as("mkt_share"))
  }

  // --- q10_returned_items: top-20 customers by returned revenue (Q10) ---
  val q10ReturnedItems = QueryDef.sql(
    "q10_returned_items",
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    val rev = dec(col("l_extendedprice")) * (one - col("l_discount").cast("decimal(4,2)"))
    // Pre-aggregate revenue per customer KEY below the customer join
    // (the q18 lesson): the grouping attrs (c_name, c_acctbal, n_name)
    // are functionally dependent on c_custkey, so grouping by the key
    // alone is value-identical — and the customer table's strings never
    // ride through the big lineitem⋈orders shuffle. The per-customer
    // aggregate is tiny, so AQE broadcasts it onto customer.
    val perCust = T.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(T.orders(s, d).filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(rev).as("rev"))
    perCust
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        col("rev").cast("double").as("revenue"), col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // --- q13_cust_distribution: histogram of per-customer order counts
  // (Q13) — LEFT OUTER with an ON-clause filter, zero bucket included ---
  val q13CustDistribution = QueryDef.sql(
    "q13_cust_distribution",
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin) { (s, d) =>
    val c = T.customer(s, d)
    val o = T.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  // --- q18_large_volume: orders whose total quantity tops 300 (Q18) —
  // HAVING over an exact decimal sum ---
  val q18LargeVolume = QueryDef.sql(
    "q18_large_volume",
    """SELECT c_custkey, o_orderkey, o_orderdate,
      |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
      |HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300""".stripMargin) { (s, d) =>
    // Pre-aggregate lineitem by orderkey with the HAVING filter FIRST:
    // the >300 survivor set is a tiny fraction of orders, so the joins
    // above it move almost nothing — vs shuffling the full 3-way join
    // product before aggregating. o_orderkey is the orders PK, so the
    // extra grouping columns of the SQL form are functionally dependent
    // and the per-orderkey aggregate is already the final grain.
    val bigOrders = T.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("q"))
      .filter(col("q") > 300)
    T.orders(s, d)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(T.customer(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("q").cast("double").as("total_qty"))
  }

  // --- q15_top_supplier: supplier(s) with max quarterly revenue (Q15:
  // the view + scalar-subquery max, restated as a window max) ---
  val q15TopSupplier = QueryDef.sql(
    "q15_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin) { (s, d) =>
    val rev = T.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(dec(col("l_extendedprice")) * (one - col("l_discount").cast("decimal(4,2)")))
        .as("total_revenue"))
    // Scalar max as a 1-row aggregate broadcast back onto rev (q22's
    // pattern) — a partition-less window would funnel every supplier's
    // row through one task to compute the same value.
    val best = rev.agg(max(col("total_revenue")).as("best"))
    rev.join(broadcast(best), col("total_revenue") === col("best"))
      .join(broadcast(T.supplier(s, d)), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
  }

  // --- q16_parts_supplier: distinct supplier counts by part attributes
  // with a NOT IN exclusion (Q16 shape on the lineitem link) ---
  val q16PartsSupplier = QueryDef.sql(
    "q16_parts_supplier",
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |  ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#11' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |GROUP BY p_brand, p_type, p_size""".stripMargin) { (s, d) =>
    val ps = T.lineitem(s, d).select(col("l_partkey"), col("l_suppkey")).distinct()
    T.part(s, d)
      .filter(col("p_brand") =!= "Brand#11" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .join(ps, col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  // --- q22_global_sales: above-average-balance customers with no RECENT
  // orders (Q22 shape: scalar-subquery average + anti join; the fixture
  // generator gives every customer an order, so "no orders at all" was a
  // vacuous gate — "lapsed since 2000" keeps the anti-join non-empty) ---
  val q22GlobalSales = QueryDef.sql(
    "q22_global_sales",
    """WITH avg_bal AS (
      |  SELECT avg(CAST(c_acctbal AS DECIMAL(12,2))) AS a FROM customer WHERE c_acctbal > 0),
      |eligible AS (
      |  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |  FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > (SELECT a FROM avg_bal))
      |SELECT c_nationkey, count(*) AS numcust, CAST(sum(bal) AS DOUBLE) AS totacctbal
      |FROM eligible
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c_nationkey""".stripMargin) { (s, d) =>
    val cust = T.customer(s, d).withColumn("bal", dec(col("c_acctbal")))
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("bal")).as("a"))
    val eligible = cust.join(broadcast(avgBal)).filter(col("bal") > col("a"))
    val recent = T.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
    eligible
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal")).cast("double").as("totacctbal"))
  }

  // --- q17_small_quantity: revenue from below-average-quantity line
  // items of selected parts (Q17's correlated-average shape, restated on
  // the fixture schema: no p_container, so brand + size select parts).
  // The correlated `l_quantity < 0.2 * avg(l_quantity per part)` is
  // de-correlated into a per-part (sum, count) aggregate and compared
  // multiplicatively — `5 * qty * cnt < sum` — so the predicate is exact
  // decimal/integer arithmetic on BOTH engines (a divided average would
  // hit double-rounding at the comparison boundary). Plan: the part
  // filter broadcasts, lineitem is semi-restricted FIRST, and the
  // per-part aggregate runs over the restricted rows only — at scale the
  // correlated aggregate is computed for selected parts, not the corpus.
  val q17SmallQuantity = QueryDef.sql(
    "q17_small_quantity",
    """WITH sel AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13' AND p_size <= 20),
      |lp AS (SELECT l_partkey, l_quantity, l_extendedprice
      |       FROM lineitem JOIN sel ON l_partkey = p_partkey),
      |pq AS (SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq, count(*) AS cnt
      |       FROM lp GROUP BY l_partkey)
      |SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
      |FROM lp l JOIN pq ON l.l_partkey = pq.l_partkey
      |WHERE CAST(l.l_quantity AS DECIMAL(12,2)) * 5 * pq.cnt < pq.sq""".stripMargin) { (s, d) =>
    val sel = T.part(s, d)
      .filter(col("p_brand") === "Brand#13" && col("p_size") <= 20)
      .select(col("p_partkey"))
    val lp = T.lineitem(s, d)
      .join(broadcast(sel), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val pq = lp.groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"), count(lit(1)).as("cnt"))
    lp.join(pq, Seq("l_partkey"))
      .filter(dec(col("l_quantity")) * 5 * col("cnt") < col("sq"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
        .cast("double").as("avg_yearly"))
  }

  // --- q11_important_value: parts holding an outsized share of one
  // nation's supplied value (TPC-H Q11's shape — group + HAVING against
  // a scalar-subquery fraction of the total — restated on the fixture:
  // no partsupp table, so "value" is lineitem extendedprice × quantity
  // through the supplier→nation link). The scalar total is a 1-row
  // aggregate broadcast back onto the per-part aggregate (q22's
  // pattern); the nation-filtered supplier dim broadcasts, so at scale
  // the only shuffle is the per-part partial aggregate. The HAVING
  // boundary compares doubles in the identical expression shape on both
  // engines (one cast, one division), so ties decide identically. ---
  val q11ImportantValue = QueryDef.sql(
    "q11_important_value",
    """WITH nat AS (
      |  SELECT l_partkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS val
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_4'
      |  GROUP BY l_partkey),
      |tot AS (SELECT sum(val) AS total FROM nat)
      |SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
      |FROM nat, tot
      |WHERE CAST(val AS DOUBLE) > CAST(total AS DOUBLE) / 500.0""".stripMargin) { (s, d) =>
    val supp = T.supplier(s, d)
      .join(T.nation(s, d).filter(col("n_name") === "NATION_4"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val nat = T.lineitem(s, d)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("val"))
    val tot = nat.agg(sum(col("val")).as("total"))
    nat.join(broadcast(tot))
      .filter(col("val").cast("double") > col("total").cast("double") / lit(500.0))
      .select(col("l_partkey"), col("val").cast("double").as("part_value"))
  }

  // --- q21_waiting_supplier: suppliers who were the SOLE late shipper
  // on multi-supplier finished orders (TPC-H Q21's double-EXISTS shape,
  // adapted: no l_commitdate/l_receiptdate in the fixture, so "late" is
  // shipped more than 90 days after the order date). The oracle keeps
  // the correlated EXISTS / NOT EXISTS formulation; the Spark plan
  // de-correlates it into ONE per-order aggregate — distinct-supplier
  // count and distinct-LATE-supplier count — computed below the joins,
  // so each order's multi-supplier/sole-late verdict is a pair of
  // integers, not two more passes over lineitem. A late row qualifies
  // iff its order has ≥2 suppliers and exactly 1 late one (that one is
  // necessarily this row's). Supplier×nation broadcasts; both lineitem
  // shuffles key on l_orderkey so AQE reuses the exchange. ---
  val q21WaitingSupplier = QueryDef.sql(
    "q21_waiting_supplier",
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_4'
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin) { (s, d) =>
    val ord = T.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val flagged = T.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
    val stats = flagged.groupBy(col("l_orderkey").as("k"))
      .agg(
        countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("nl"))
      .filter(col("ns") >= 2 && col("nl") === 1)
    val supp = T.supplier(s, d)
      .join(T.nation(s, d).filter(col("n_name") === "NATION_4"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    flagged.filter(col("late"))
      .join(stats, col("l_orderkey") === col("k"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val all: Seq[QueryDef] = Seq(
    q4OrderPriority, q7VolumeShipping, q12Shipmode, q14PromoRatio, q19Disjunctive,
    q2BestSupplier, q9Profit, q20SemiChain,
    q3ShippingPriority, q5LocalSupplier, q6ForecastRevenue, q8MarketShare,
    q10ReturnedItems, q13CustDistribution, q18LargeVolume,
    q15TopSupplier, q16PartsSupplier, q22GlobalSales, q17SmallQuantity,
    q11ImportantValue, q21WaitingSupplier)
}
