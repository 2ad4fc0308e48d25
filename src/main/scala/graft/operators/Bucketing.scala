package graft.operators

import org.apache.hadoop.fs.Path
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

  /** Write `df` as a bucketed+sorted managed table on `key`.
    *
    * Re-run safe across JVMs: a fresh metastore doesn't know about a
    * previous run's table, and `saveAsTable` refuses to adopt the orphaned
    * warehouse directory (LOCATION_ALREADY_EXISTS) even in Overwrite mode
    * — so drop the catalog entry AND delete the stale location first.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new Path(spark.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

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
