package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Repartition, Window}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan linter: the 100-TB scale-killer audit as a library API.
  *
  * The discipline this repo enforces on its own registry (PlanSpec's
  * guards: no partition-less windows, no cartesian products, pushed
  * scan filters, broadcast-sized dimensions) is exactly what a user
  * should be able to run against THEIR plans before shipping them to a
  * 1000-executor cluster. `lint` walks the optimized logical plan and
  * the (adaptive-aware) physical plan and returns structured findings;
  * `assertScales` turns fatal findings into an exception — a CI gate.
  *
  * Severity model:
  *   - `fatal`: the plan funnels unbounded data through one task or one
  *     pair-loop — it will not survive a 100× scale-up (partition-less
  *     window; cartesian product; global sort with no limit).
  *   - `warn`: fine at dimension scale, a review flag at fact scale
  *     (broadcast nested-loop join; single-partition repartition;
  *     scan-adjacent filters that did not push down).
  *   - `info`: shuffle inventory — the numbers to watch, not a verdict.
  *
  * Rules read STRUCTURE (Catalyst nodes), not plan strings, so they
  * survive formatting changes; the adaptive wrapper and reused/staged
  * exchanges are traversed to the live plan underneath.
  */
object PlanLint {

  final case class Finding(severity: String, rule: String, node: String, detail: String) {
    override def toString: String = s"[$severity] $rule @ $node: $detail"
  }

  /** All findings for the DataFrame's current plan. */
  def lint(df: DataFrame): Seq[Finding] =
    lintLogical(df.queryExecution.optimizedPlan) ++
      lintPhysical(df.queryExecution.executedPlan)

  /** Throws IllegalStateException listing fatal findings, if any. */
  def assertScales(df: DataFrame): Unit = {
    val fatal = lint(df).filter(_.severity == "fatal")
    if (fatal.nonEmpty)
      throw new IllegalStateException(
        s"plan has ${fatal.size} scale-killer(s):\n${fatal.mkString("\n")}")
  }

  /** Fatal gate for STAGED intermediate writes (`Scratch.RoundChain
    * .stage` and friends). The registry-wide sweep lints only each
    * query's RETURNED frame — round 10's graph-ANN ring built a
    * partition-less global window, staged it to scratch, and the sweep
    * never saw it. This gate lints the plan a stage is about to
    * EXECUTE. It reads the ANALYZED plan (already computed for the
    * write — no second optimizer pass per iterative round), so it
    * additionally treats an all-FOLDABLE partition spec (e.g.
    * `Window.partitionBy(lit("all"))`, which the optimizer folds to an
    * empty spec) as partition-less. Bounded single-task folds are
    * allowed only through the staging API's explicit `boundedRows`
    * assertion, which is verified against the written row count. */
  def assertStagedScales(df: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    val out = Seq.newBuilder[Finding]
    def walk(p: LogicalPlan): Unit = {
      p match {
        case w: Window if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) =>
          out += Finding("fatal", "partition-less-window", "Window",
            "staged plan funnels every row into ONE window task (empty or " +
              "constant PARTITION BY); stage a distributed formulation, or " +
              "assert a row bound via stage(..., boundedRows = n)")
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.analyzed)
    val fatal = out.result()
    if (fatal.nonEmpty)
      throw new IllegalStateException(
        s"staged plan has ${fatal.size} scale-killer(s):\n${fatal.mkString("\n")}")
  }

  /** Human-readable report (all severities). */
  def report(df: DataFrame): String = {
    val fs = lint(df)
    if (fs.isEmpty) "plan lint: clean"
    else s"plan lint: ${fs.size} finding(s)\n${fs.mkString("\n")}"
  }

  // ---- logical rules ------------------------------------------------

  /** Logical-plan rules only — cheap enough to sweep a whole registry
    * (no physical planning). PlanSpec's registry-wide guard runs this
    * over every registered query. */
  def lintLogical(plan: LogicalPlan): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    // Note what is NOT a rule: a global ORDER BY. Spark plans it as a
    // RANGE-partitioned shuffle — parallel, skew-sampled — and with a
    // LIMIT it collapses to TakeOrderedAndProject. The single-task
    // funnels are the empty-PARTITION BY window and explicit
    // single-partition repartitions.
    def walk(p: LogicalPlan): Unit = {
      p match {
        case w: Window if w.partitionSpec.isEmpty =>
          out += Finding("fatal", "partition-less-window", "Window",
            "empty PARTITION BY shuffles every row to ONE task; " +
              "compute the global aggregate separately and broadcast-join it back")
        case r: Repartition if r.numPartitions == 1 && r.shuffle =>
          out += Finding("warn", "single-partition-repartition", "Repartition",
            "repartition(1) serializes all downstream work into one task")
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.result()
  }

  // ---- physical rules -----------------------------------------------

  /** Flatten through the adaptive wrapper, query stages, and exchange
    * reuse to the operators that actually execute. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec        => flatten(q.plan)
    case r: ReusedExchangeExec    => flatten(r.child)
    case other                    => other.children.flatMap(flatten)
  })

  private def lintPhysical(plan: SparkPlan): Seq[Finding] = {
    val nodes = flatten(plan)
    val out = Seq.newBuilder[Finding]
    nodes.foreach {
      case _: CartesianProductExec =>
        out += Finding("fatal", "cartesian-product", "CartesianProductExec",
          "every pair of partitions pairs up (O(n·m) tasks); add an equi-join key " +
            "(bin/bucket the predicate) or broadcast the small side")
      case j: BroadcastNestedLoopJoinExec =>
        out += Finding("warn", "nested-loop-broadcast", "BroadcastNestedLoopJoinExec",
          s"non-equi ${j.joinType} join loops the broadcast side per row; " +
            "correct only while the broadcast side stays dimension-sized")
      case s: FileSourceScanExec if s.dataFilters.nonEmpty && {
            // IsNotNull alone is the inferred null-presence constraint,
            // not the user's predicate — if that's ALL that pushed, the
            // real filter runs row-by-row above the scan. (The typed
            // pushedDownFilters field is protected; the rendered
            // metadata carries the same inventory.)
            val pushed = s.metadata.getOrElse("PushedFilters", "[]")
            """[A-Za-z]\w*\(""".r.findAllIn(pushed)
              .map(_.dropRight(1)).forall(_ == "IsNotNull")
          } =>
        out += Finding("warn", "unpushed-scan-filter", s.nodeName,
          s"${s.dataFilters.size} filter(s) evaluate AFTER the scan " +
            "(nothing beyond null-presence reached the reader); " +
            "check for casts/functions around the filtered column")
      case _ =>
    }
    nodes.foreach {
      case e: ShuffleExchangeExec
          if e.outputPartitioning == org.apache.spark.sql.catalyst.plans.physical.SinglePartition =>
        out += Finding("warn", "single-partition-exchange", "ShuffleExchangeExec",
          "a shuffle collapses to ONE partition mid-plan; whatever sits above it runs serially")
      case _ =>
    }
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    if (shuffles > 0)
      out += Finding("info", "shuffle-count", "ShuffleExchangeExec",
        s"$shuffles shuffle exchange(s) in the plan")
    out.result()
  }
}
