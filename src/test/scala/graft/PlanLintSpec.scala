package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.PlanLint

/** PlanLint must flag exactly the plans the repo's own discipline bans,
  * and pass the plans the repo considers scale-correct.
  */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables.orders(spark, sfDir)
  private def customer = Tables.customer(spark, sfDir)

  test("fatal: partition-less window is the single-task funnel") {
    val df = orders.withColumn("rn", row_number().over(Window.orderBy(col("o_orderkey"))))
    val fatals = PlanLint.lint(df).filter(_.severity == "fatal")
    assert(fatals.exists(_.rule == "partition-less-window"), fatals.mkString("; "))
    val ex = intercept[IllegalStateException](PlanLint.assertScales(df))
    assert(ex.getMessage.contains("partition-less-window"))
  }

  test("fatal: cartesian product when nothing broadcasts") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val df = orders.crossJoin(customer)
      assert(PlanLint.lint(df).exists(_.rule == "cartesian-product"))
    } finally spark.conf.set(key, prev)
  }

  test("warn: broadcast nested-loop join and single-partition repartition") {
    val bnl = orders.crossJoin(broadcast(customer.limit(5)))
    assert(PlanLint.lint(bnl).exists(_.rule == "nested-loop-broadcast"))
    val rep1 = orders.repartition(1).groupBy(col("o_orderstatus")).count()
    assert(PlanLint.lint(rep1).exists(_.rule == "single-partition-repartition"))
  }

  test("warn: filter that cannot reach the reader") {
    // abs() around the column defeats pushdown; only the inferred
    // IsNotNull constraint reaches the parquet reader.
    val df = orders.filter(abs(col("o_custkey")) > 100)
    val fs = PlanLint.lint(df)
    assert(fs.exists(_.rule == "unpushed-scan-filter"), fs.mkString("; "))
    // ...and a plain range predicate pushes, so the rule stays quiet.
    val ok = orders.filter(col("o_custkey") > 100)
    assert(!PlanLint.lint(ok).exists(_.rule == "unpushed-scan-filter"))
  }

  test("clean: broadcast equi-join + aggregate passes assertScales") {
    val df = orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    PlanLint.assertScales(df)
    val fs = PlanLint.lint(df)
    assert(fs.forall(f => f.severity != "fatal"), fs.mkString("; "))
    assert(fs.exists(_.rule == "shuffle-count")) // the aggregate's exchange is inventoried
  }

  test("orderBy with limit plans as top-k, not a flagged funnel") {
    val df = orders.orderBy(col("o_totalprice").desc).limit(10)
    PlanLint.assertScales(df)
  }
}
