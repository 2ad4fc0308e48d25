package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables => T}

/** General analytics surface over the TPC-H-ish fixture tables.
  *
  * Oracle-parity rules used throughout this package:
  *   - Money/measure arithmetic goes through exact DECIMAL casts before
  *     any SUM so results are order-of-summation independent and
  *     bit-identical between Spark and DuckDB (SURVEY.md §1.2: money
  *     never becomes Double).
  *   - Every ORDER BY used under a LIMIT carries a unique tie-break key.
  *   - Aggregate/computed columns are aliased identically in the Spark
  *     plan and the oracle SQL (driver hashes after sorting columns by
  *     name).
  */
object CoreAnalytics {

  private def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(s"decimal($p,$s)")
  private val one = lit(1).cast("decimal(4,2)")

  /** Revenue expression used by several queries: extendedprice * (1 - discount),
    * exact decimal arithmetic → (17,4) in Spark, (16,4) in DuckDB, same values. */
  private def revenue(df: DataFrame): Column =
    dec(col("l_extendedprice")) * (one - dec(col("l_discount"), 4, 2))

  // --- a1_pricing_summary: TPC-H Q1-style hash aggregate (SURVEY §2.5) ---
  val a1PricingSummary = QueryDef.sql(
    "a1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    T.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"), 4, 2))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  // --- a2_top_orders: join + agg + order/limit with unique tie-break ---
  val a2TopOrders = QueryDef.sql(
    "a2_top_orders",
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin) { (s, d) =>
    val cust = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = T.orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
    val li   = T.lineitem(s, d).filter(col("l_shipdate") > to_timestamp(lit("1997-01-01")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenue(li)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // --- a3_nation_revenue: 5-way join with broadcast dims (SURVEY §2.4 J3 at scale) ---
  val a3NationRevenue = QueryDef.sql(
    "a3_nation_revenue",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin) { (s, d) =>
    val li  = T.lineitem(s, d)
    val ord = T.orders(s, d)
    val cu  = T.customer(s, d)
    val na  = T.nation(s, d)
    val re  = T.region(s, d).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .join(broadcast(na), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue(li)).cast("double").as("revenue"), count(lit(1)).as("n_items"))
  }

  // --- a4_window_topk: row_number window, top-5 customers per segment (SURVEY §2.5) ---
  val a4WindowTopk = QueryDef.sql(
    "a4_window_topk",
    """SELECT c_custkey, c_name, c_mktsegment, c_acctbal, rn FROM (
      |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) t
      |WHERE rn <= 5""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    T.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
  }

  // --- a5_running_window: cumulative sum / moving frame per key (SURVEY §2.5) ---
  val a5RunningWindow = QueryDef.sql(
    "a5_running_window",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
      |FROM orders""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    T.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      sum(dec(col("o_totalprice"), 14, 2)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double").as("running_spend"),
      lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"))
  }

  // --- a6_semi_join: EXISTS via left_semi (customers with an urgent order) ---
  val a6SemiJoin = QueryDef.sql(
    "a6_semi_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin) { (s, d) =>
    val urgent = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    T.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  // --- a7_anti_join: NOT EXISTS via left_anti (customers with no URGENT
  // order — the fixture generator gives every customer at least one order,
  // so the bare no-orders predicate was vacuous at sf0.01; the priority
  // restriction keeps the anti-join shape and emits real rows) ---
  val a7AntiJoin = QueryDef.sql(
    "a7_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin) { (s, d) =>
    val urgent = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    T.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  // --- a8_set_ops: INTERSECT / EXCEPT set semantics (SURVEY §2.5) ---
  val a8SetOps = QueryDef.sql(
    "a8_set_ops",
    """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      |INTERSECT
      |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'""".stripMargin) { (s, d) =>
    val li = T.lineitem(s, d)
    li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
      .intersect(li.filter(col("l_returnflag") === "A").select(col("l_partkey")))
  }

  // --- a9_rollup: hierarchical aggregate (SURVEY §2.5 grouping sets) ---
  val a9Rollup = QueryDef.sql(
    "a9_rollup",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"), 14, 2)).cast("double").as("total"))
  }

  // --- a10_explode: array flatten via explode (SURVEY §2.4 J2 analog) ---
  val a10Explode = QueryDef.sql(
    "a10_explode",
    """SELECT token, count(*) AS n, count(DISTINCT p_partkey) AS n_parts
      |FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS token FROM part) t
      |GROUP BY token""".stripMargin) { (s, d) =>
    T.part(s, d)
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"), countDistinct(col("p_partkey")).as("n_parts"))
  }

  // --- a11_distinct_agg: multi-distinct + conditional aggregation ---
  val a11DistinctAgg = QueryDef.sql(
    "a11_distinct_agg",
    """SELECT o_orderstatus,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders,
      |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big
      |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
    T.orders(s, d).groupBy(col("o_orderstatus")).agg(
      countDistinct(col("o_custkey")).as("n_customers"),
      count(lit(1)).as("n_orders"),
      count(when(col("o_totalprice") > 100000, lit(1))).as("n_big"))
  }

  // --- a12_scan_filter_project: pushdown-friendly scan (SURVEY §2.1 S1-S6) ---
  val a12ScanFilterProject = QueryDef.sql(
    "a12_scan_filter_project",
    """SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-03-31'
      |  AND l_quantity > 45""".stripMargin) { (s, d) =>
    // fixture shipdates start 1995-01-02, so a 1994 window was vacuous
    T.lineitem(s, d)
      .filter(col("l_shipdate").between(to_timestamp(lit("1995-01-01")), to_timestamp(lit("1995-03-31")))
        && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_shipdate"))
  }

  val all: Seq[QueryDef] = Seq(
    a1PricingSummary, a2TopOrders, a3NationRevenue, a4WindowTopk, a5RunningWindow,
    a6SemiJoin, a7AntiJoin, a8SetOps, a9Rollup, a10Explode, a11DistinctAgg,
    a12ScanFilterProject)
}
