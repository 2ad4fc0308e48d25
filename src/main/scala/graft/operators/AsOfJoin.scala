package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for every left row, attach the columns of
  * the latest right row with the same key and `rightTs <= leftTs`
  * (inclusive). Spark has no built-in as-of join; rather than a custom
  * SparkPlan, this composes built-ins per the extension preference order
  * (SURVEY.md: compose > Expression > Strategy): both sides are unioned
  * into one stream, ONE shuffle on (key), and a running `last(_, ignore
  * nulls)` window carries the most recent right values forward onto each
  * left row.
  *
  * Cost at scale: a single hash partition by key + in-partition sort —
  * strictly cheaper than the naive range-join (which explodes to
  * O(left×right) pairs per key before aggregation). Equal timestamps:
  * right rows sort before left rows, so a right row at exactly leftTs
  * matches (same inclusive rule as DuckDB/Pandas ASOF).
  */
object AsOfJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String): DataFrame = {
    val rightCols = right.columns.filter(c => c != key && c != rightTs).toSeq
    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"right columns ${rightCols.intersect(leftCols)} collide with left")

    // All right columns travel as ONE struct carried by a single
    // last(ignoreNulls) — carrying each column independently would let a
    // NULL field of the true matching row leak the previous row's value
    // and mix columns from different right rows (DuckDB ASOF is
    // whole-row). The struct itself is never null for right rows, so
    // ignoreNulls skips exactly the left rows.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(right.schema.fieldIndex(c))))

    val lPadded = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))

    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(rightCols.map(col): _*))
      .drop(rightTs)
    val rPadded = leftCols.filterNot(_ == key).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val sel = (leftCols ++ Seq("__r", "__ts", "__side")).map(col)
    val unioned = lPadded.select(sel: _*).unionByName(rPadded.select(sel: _*))

    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))

    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** [[asofJoin]] with a MATCH TOLERANCE: the latest right row at most
    * `toleranceSeconds` old still matches; anything staler is treated
    * as no match (all right columns null) — the market-data/feature-
    * freshness rule ("use the last quote, unless it's gone stale").
    * Same single-shuffle plan: the carried struct additionally carries
    * the matched right timestamp, and one post-filter nulls out stale
    * matches — no second join, no extra shuffle. */
  def asofJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      toleranceSeconds: Long): DataFrame = {
    val rightCols = right.columns.filter(c => c != key && c != rightTs).toSeq
    val joined = asofJoin(
      left, right.withColumn("__mts", col(rightTs)), key, leftTs, rightTs)
    val fresh = col("__mts").isNotNull &&
      unix_micros(col(leftTs)) - unix_micros(col("__mts")) <= toleranceSeconds * 1000000L
    rightCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        when(fresh, col(c)).otherwise(lit(null).cast(right.schema(c).dataType)))
    }.drop("__mts")
  }
}
