package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards: the perf-critical plan properties
  * (pushdown, pruning, broadcast strategy, partial aggregation) are
  * asserted so a refactor can't silently regress them. Plans are
  * inspected pre-execution with AQE's initial plan formatting.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(FormattedMode)

  test("a12: filters and projection reach the parquet scan") {
    val p = planOf("a12_scan_filter_project")
    assert(p.contains("PushedFilters"), "no pushed filters section")
    assert(p.contains("GreaterThan(l_quantity,45.0)"), s"quantity bound not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"), "shipdate lower bound not pushed")
    // pruned read schema: only the 4 selected columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_returnflag"),
      s"column pruning failed: $readSchema")
  }

  test("a1: aggregate is partial+final (map-side combine before the exchange)") {
    val p = planOf("a1_pricing_summary")
    val aggCount = "HashAggregate".r.findAllIn(p).size
    assert(aggCount >= 2, s"expected partial+final HashAggregate, got $aggCount:\n$p")
    assert(p.contains("Exchange"), "no shuffle exchange for groupBy")
  }

  test("a3: all dimension joins broadcast, no nested-loop join") {
    val p = planOf("a3_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "nation/region dims must broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "unexpected nested-loop/cartesian join")
  }

  test("j3: left lookup join broadcasts the dimension side") {
    val p = planOf("j3_lookup")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"),
      s"expected broadcast left-outer lookup:\n$p")
  }

  test("a6/a7: semi and anti joins stay join-shaped (no aggregate rewrite)") {
    assert(planOf("a6_semi_join").contains("LeftSemi"))
    assert(planOf("a7_anti_join").contains("LeftAnti"))
  }

  test("events scan prunes columns for p2 projection") {
    val p = planOf("p2_time_window")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props"), s"props should be pruned: $readSchema")
  }
}
