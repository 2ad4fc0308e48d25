package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables => T}
import graft.functions.ArrayDotProduct

/** Additional engine-surface coverage: CUBE, pivot, raw-SQL entry (one
  * dialect-portable text through both engines), and the codegen'd native
  * expression fast path.
  */
object Extras {

  // --- a13_cube: full grouping-sets lattice ---
  val a13Cube = QueryDef.sql(
    "a13_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("total"))
  }

  // --- a14_pivot: status columns per priority (DataFrame pivot; the
  // oracle states the same thing as conditional aggregation) ---
  val a14Pivot = QueryDef.sql(
    "a14_pivot",
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
    T.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
  }

  // --- sql1_shared_dialect: the engine's SQL surface — the SAME SQL text
  // is executed by Spark SQL here and by DuckDB as the oracle (Spark SQL
  // is the parser; no custom parser per SURVEY §7.4 non-goals) ---
  private val sharedSql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE event_type IN ('purchase', 'signup')
      |GROUP BY date_trunc('hour', ts), event_type""".stripMargin

  val sql1SharedDialect = QueryDef.sql("sql1_shared_dialect", sharedSql) { (s, d) =>
    T.events(s, d).createOrReplaceTempView("events")
    s.sql(sharedSql)
  }

  // --- v4_knn_fast: brute-force KNN via the native codegen'd
  // ArrayDotProduct expression (float path — Spark-deterministic, but
  // float-sum order isn't portable to the oracle: rows-only check; the
  // ExtrasSpec asserts rank agreement with oracle-gated v1) ---
  val v4KnnFast = QueryDef.rowsOnly("v4_knn_fast") { (s, d) =>
    val emb = T.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cosine", ArrayDotProduct.cosineF(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  // --- a15_approx_sketch: approximate distinct/percentile sketches —
  // partition-local sketches merged at the driver (the 100 TB path for
  // cardinality/quantiles). Sketch internals differ across engines, so
  // this is a rows-only check; ExtrasSpec bounds the error vs exact.
  val a15ApproxSketch = QueryDef.rowsOnly("a15_approx_sketch") { (s, d) =>
    T.lineitem(s, d).groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median_price"),
      count(lit(1)).as("n"))
  }

  val all: Seq[QueryDef] = Seq(a13Cube, a14Pivot, sql1SharedDialect, v4KnnFast, a15ApproxSketch)
}
