package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge

/** Native as-of join: the full custom-operator tier (SURVEY.md §7.4 /
  * extension ladder step (c)) — a LogicalPlan node, a planner Strategy,
  * and a physical BinaryExecNode, injectable via SparkSessionExtensions.
  *
  * Why a physical operator when graft.operators.AsOfJoin already
  * composes one from built-ins: the composed form unions both sides
  * (padding every row with the other side's nulls) and runs a window
  * over the union — 2× the shuffled bytes and a running-`last` state per
  * carried column. This operator hash-partitions each side by its own
  * key, sorts by (key, ts), and does ONE streaming merge pass per
  * partition: for every left row, the most recent right row with
  * rightTs <= leftTs (inclusive ties, same rule as DuckDB ASOF).
  *
  * The planner contract does the heavy lifting: requiredChildDistribution
  * + requiredChildOrdering make EnsureRequirements insert exactly the
  * exchanges/sorts needed (and skip them when the children are already
  * bucketed/sorted — free co-located as-of joins on bucketed tables).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val lOut = left.output
    val rOut = right.output
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrdering = TypeUtils.getInterpretedOrdering(leftTs.dataType)

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKey = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKey = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTs = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTs = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // Bind right attributes nullable: unmatched left rows project
      // nullRight, and without the null checks non-nullable right columns
      // would surface as 0/false instead of NULL. BindReferences takes
      // nullability from the INPUT schema attribute, so the input side
      // must be marked nullable too.
      val rOutNullable = rOut.map(_.withNullability(true))
      val output = UnsafeProjection.create(
        lOut ++ rOutNullable, lOut ++ rOutNullable)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _          // next unconsumed right row
        private var rHeadKey: Any = _
        private var rHeadTs: Any = _
        private var matched: InternalRow = _        // last right row taken for current key
        private var matchedKey: Any = _

        private def advanceRight(): Unit =
          if (rIt.hasNext) {
            rHead = rIt.next().copy()
            // UnsafeProjection reuses its buffer: for non-primitive key
            // types .get() returns a view into it, which the next
            // advanceRight() overwrites — copy the values out so
            // matchedKey stays valid across iterations.
            rHeadKey = InternalRow.copyValue(rKey(rHead).get(0, rKeyExpr.dataType))
            rHeadTs = InternalRow.copyValue(rTs(rHead).get(0, rTsExpr.dataType))
          } else rHead = null

        advanceRight()

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val k = lKey(l).get(0, lKeyExpr.dataType)
          val t = lTs(l).get(0, lTsExpr.dataType)
          val rightSide =
            if (forward) {
              // FORWARD direction: earliest right with rts >= lts.
              // Consume right rows strictly behind the current left
              // (rkey < k, or rkey == k && rts < t) — left ts ascends, so
              // a discarded row can never match a later left row; the
              // surviving head is shared by every left row it covers
              // (NOT consumed on match — the same future right row is the
              // answer for every earlier left in its gap).
              var continue = rHead != null
              while (continue) {
                val c = keyOrdering.asInstanceOf[Ordering[Any]].compare(rHeadKey, k)
                if (c < 0 || (c == 0 &&
                    tsOrdering.asInstanceOf[Ordering[Any]].compare(rHeadTs, t) < 0)) {
                  advanceRight(); continue = rHead != null
                } else continue = false
              }
              if (rHead != null && keyOrdering.asInstanceOf[Ordering[Any]]
                .compare(rHeadKey, k) == 0) rHead
              else nullRight
            } else {
              // BACKWARD (default): consume right rows with (rkey < k) or
              // (rkey == k && rts <= t); the last one with rkey == k
              // becomes the match
              var continue = rHead != null
              while (continue) {
                val c = keyOrdering.asInstanceOf[Ordering[Any]].compare(rHeadKey, k)
                if (c < 0) {
                  advanceRight(); continue = rHead != null
                } else if (c == 0 &&
                    tsOrdering.asInstanceOf[Ordering[Any]].compare(rHeadTs, t) <= 0) {
                  matched = rHead; matchedKey = rHeadKey
                  advanceRight(); continue = rHead != null
                } else continue = false
              }
              if (matched != null && keyOrdering.asInstanceOf[Ordering[Any]]
                .compare(matchedKey, k) == 0) matched
              else nullRight
            }
          output(joined(l, rightSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API + extension registration. */
object AsOfJoinNative {

  /** Install the planner strategy (idempotent). Alternatively register
    * [[GraftExtensions]] via `spark.sql.extensions` at session build. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Native as-of join; same semantics as graft.operators.AsOfJoin
    * (latest right with rightTs <= leftTs per key, inclusive ties,
    * left-preserving). With `forward = true` the direction flips:
    * EARLIEST right with rightTs >= leftTs (DuckDB's `l.ts <= r.ts`
    * ASOF shape) — the "next event after" point-in-time lookup.
    * Right's key/ts columns are kept in the output. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    graftbridge.datasetOf(spark, AsOfJoinPlan(
      lPlan, rPlan,
      resolve(lPlan, leftKey), resolve(rPlan, rightKey),
      resolve(lPlan, leftTs), resolve(rPlan, rightTs), forward))
  }
}

/** `spark.sql.extensions`-compatible registration. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(session => RangeJoinRule(session))
    e.injectOptimizerRule(session => JoinReorderRule(session))
    e.injectOptimizerRule(session => MvRewriteRule(session))
    e.injectOptimizerRule(session => AsOfJoinRule(session))
    AsOfSqlSurface.functions.foreach(e.injectFunction)
  }
}
