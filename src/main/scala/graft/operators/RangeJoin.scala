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

  /** Join rows of `a` and `b` whose intervals overlap
    * (`alo <= bhi && blo <= ahi`, inclusive), via the same bin grid.
    * Both sides explode onto their covered bins; a pair that shares
    * several bins is emitted exactly once WITHOUT a distinct: the pair
    * is owned by the first bin both intervals cover — the later of the
    * two start bins — so no dedup shuffle is ever needed. Column names
    * must be disjoint across `a` and `b`. */
  def intervalOverlap(
      a: DataFrame, aloCol: String, ahiCol: String,
      b: DataFrame, bloCol: String, bhiCol: String,
      binWidth: Double): DataFrame = {
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bin",
        explode(sequence(
          floor(col(lo) / lit(binWidth)).cast("long"),
          floor(col(hi) / lit(binWidth)).cast("long"))))
    binned(a, aloCol, ahiCol).join(binned(b, bloCol, bhiCol), Seq("__bin"))
      .filter(col(aloCol) <= col(bhiCol) && col(bloCol) <= col(ahiCol))
      .filter(col("__bin") === greatest(
        floor(col(aloCol) / lit(binWidth)).cast("long"),
        floor(col(bloCol) / lit(binWidth)).cast("long")))
      .drop("__bin")
  }
}
