package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executed-plan METRICS audit — the "actual rows per operator" readout
  * every plan-tuning loop needs: `.explain` shows the shape, this shows
  * what each operator actually DID (scan rows vs filter survivors vs
  * join fan-out), which is where selectivity misestimates, filters that
  * didn't push down, and joins that exploded become visible. Plan-
  * walking over the post-AQE FINAL plan (estimates are re-planned at
  * runtime; auditing the initial plan would lie), driver-side and
  * data-size-independent — the metrics already exist on every executed
  * operator, this just surfaces them in dependency order.
  *
  * Complements [[PlanLint]] (static anti-pattern guard, pre-execution)
  * and the SkewEvidenceSpec discipline (asserts on post-AQE plan
  * SHAPE): this is the row-count evidence layer, usable in specs as
  * "the filter actually cut the scan" assertions.
  */
object PlanMetrics {

  final case class NodeMetric(depth: Int, node: String, outputRows: Option[Long])

  /** Unwrap the AQE wrappers (re-applied until a real operator shows:
    * AdaptiveSparkPlanExec holds the re-planned tree, QueryStageExec
    * nodes hold materialized stages with EMPTY `children`). */
  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case q: QueryStageExec => finalPlan(q.plan)
    case other => other
  }

  private def walk(p: SparkPlan, depth: Int): Seq[NodeMetric] = {
    val here = NodeMetric(depth, p.nodeName,
      p.metrics.get("numOutputRows").map(_.value))
    here +: p.children.flatMap(c => walk(finalPlan(c), depth + 1))
  }

  /** Run `df` and return every operator's actual output-row metric,
    * root first. Executes through the frame's OWN QueryExecution (a
    * separate action like `.count()` builds a different plan instance
    * whose metrics this walk would never see) without collecting rows
    * to the driver. */
  def actualRows(df: DataFrame): Seq[NodeMetric] = {
    val qe = df.queryExecution
    // execute THIS plan, rows staying distributed — and CONSUME each
    // partition's iterator: operators above the last exchange only run
    // as far as the iterator is pulled (an ignored iterator reads as
    // "0 output rows" on every post-shuffle operator)
    qe.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    walk(finalPlan(qe.executedPlan), 0)
  }

  /** The actual output rows of the first operator whose name contains
    * `node` (case-insensitive), after [[actualRows]]-style execution. */
  def rowsOf(metrics: Seq[NodeMetric], node: String): Option[Long] =
    metrics.find(_.node.toLowerCase.contains(node.toLowerCase))
      .flatMap(_.outputRows)
}
