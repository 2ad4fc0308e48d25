package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanMetrics

/** Executed-plan metrics: actual per-operator row counts surface
  * selectivity and join fan-out after AQE re-planning. */
class PlanMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("filter survivors and join fan-out are visible as actual rows") {
    val fact = (1L to 1000L).map(i => (i, i % 10)).toDF("id", "k")
    val dim = (0L until 10L).map(i => (i, s"d$i")).toDF("k", "name")
    val q = fact.filter(col("id") % 4 === 0)
      .join(broadcast(dim), Seq("k"))
    val m = PlanMetrics.actualRows(q)

    // the filter actually cut the scan: 250 of 1000 survive
    assert(PlanMetrics.rowsOf(m, "BroadcastHashJoin") === Some(250L),
      s"unexpected metrics:\n${m.mkString("\n")}")
    // and the metric walk descends through the whole final plan
    assert(m.exists(_.depth >= 2), "plan walk must recurse past the root")
    assert(m.head.depth === 0)
  }

  test("aggregation output rows reflect the group count, not the input") {
    val df = (1L to 999L).map(i => (i % 7, i)).toDF("g", "v")
      .groupBy(col("g")).agg(sum(col("v")).as("s"))
    val m = PlanMetrics.actualRows(df)
    // the FINAL aggregate emits exactly the 7 groups
    val aggRows = m.filter(_.node.toLowerCase.contains("hashaggregate"))
      .flatMap(_.outputRows)
    assert(aggRows.contains(7L), s"unexpected metrics:\n${m.mkString("\n")}")
  }
}
