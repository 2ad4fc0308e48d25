package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join.
  *
  * Spark plans a raw `p.v BETWEEN i.lo AND i.hi` join as a broadcast
  * nested loop (or worse, a cartesian) — O(|points| × |intervals|)
  * comparisons, a non-starter when both sides are large. The standard
  * scale rewrite, implemented here: overlay a fixed-width bin grid.
  * Each interval explodes onto the bins it covers (span/binWidth rows —
  * bounded and small when binWidth is chosen near the typical interval
  * span), each point maps to exactly one bin, and the join becomes a
  * plain hash equi-join on the bin id that shuffles both sides by bin —
  * co-partitioned, AQE-skew-splittable, broadcast-able when one side is
  * small. The exact containment predicate then filters the bin
  * collisions, so the rewrite is purely a physical one: the result set
  * is identical to the nested-loop semantics (bin coverage is a
  * superset: floor is monotone, so a contained point's bin always lies
  * within its interval's bin range).
  */
object RangeJoin {

  /** Join `points` rows whose `valueCol` falls inside [loCol, hiCol] of
    * `intervals` (inclusive), via the binned equi-join. Overlapping
    * intervals yield one output row per containing interval. */
  def pointInInterval(
      points: DataFrame,
      valueCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    val pts = points.withColumn("__bin", floor(col(valueCol) / lit(binWidth)).cast("long"))
    val ivs = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / lit(binWidth)).cast("long"),
        floor(col(hiCol) / lit(binWidth)).cast("long"))))
    pts.join(ivs, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bin")
  }
}
