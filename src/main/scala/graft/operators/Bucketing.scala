package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffling fact tables once at write time
  * so every subsequent equi-join/aggregation on the bucket key runs
  * WITHOUT a shuffle exchange (SURVEY.md §4: "co-located joins via
  * bucketing"). At 100 TB this converts the dominant per-query cost
  * (re-shuffling the fact table for each join) into a one-time write
  * layout decision — the Spark-native analog of the reference's keyed
  * target tables.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans as a
    * sort-merge join over the bucketed layout with zero Exchange nodes
    * when bucket counts match. */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
