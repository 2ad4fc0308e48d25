package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental per-PARTITION table statistics — the ANALYZE that scales:
  * a 100 TB table's stats must refresh in O(changed partitions), never
  * O(table), or nobody runs ANALYZE and every optimizer estimate goes
  * stale. The store keeps one row per partition value (row count plus
  * min/max/null-count per tracked column — the zone-map/CBO feed), laid
  * out as parquet PARTITIONED BY the same key, so refreshing a subset of
  * partitions is a dynamic partition overwrite of exactly those stats
  * rows: the write-side analog of the keyed upsert's affected-set
  * discipline (the upsert already KNOWS its affected partitions — pass
  * them straight in).
  *
  * Stats are exact integers/values (counts, min, max), so an
  * incremental refresh after a change converges to bit-identical stats
  * with a from-scratch rebuild — which is what the k37 gate hash-proves.
  */
object StatsStore {

  private def aggs(cols: Seq[String]): Seq[Column] =
    (count(lit(1)).as("rows") +:
      cols.flatMap { c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
          count(when(col(c).isNull, 1)).as(s"nulls_$c"))
      })

  /** Full rebuild: one column-pruned scan, one partition-grained
    * partial-agg shuffle, stats landed partitioned by `partCol`. */
  def rebuild(
      spark: SparkSession,
      tablePath: String,
      statsPath: String,
      partCol: String,
      cols: Seq[String]): Unit = {
    val a = aggs(cols)
    spark.read.parquet(tablePath)
      .groupBy(col(partCol))
      .agg(a.head, a.tail: _*)
      .write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(statsPath)
  }

  /** Incremental refresh: recompute stats ONLY for `changed` partition
    * values (the upsert's affected set) and dynamically overwrite just
    * those stats rows — every other partition's stats ride untouched.
    * Cost: a partition-pruned scan of the changed slice + a k-row
    * write. */
  def refreshPartitions(
      spark: SparkSession,
      tablePath: String,
      statsPath: String,
      partCol: String,
      cols: Seq[String],
      changed: Seq[Any]): Unit = {
    if (changed.isEmpty) return
    val a = aggs(cols)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.read.parquet(tablePath)
        .filter(col(partCol).isin(changed: _*)) // partition-pruned scan
        .groupBy(col(partCol))
        .agg(a.head, a.tail: _*)
        .write.mode(SaveMode.Overwrite).partitionBy(partCol)
        .parquet(statsPath)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // Dynamic overwrite cannot express "now empty": a changed partition
    // whose recomputed slice has ZERO rows emits no file, so its stale
    // stats row would ride along and break the incremental-equals-
    // rebuild contract after deletes/scrubs. Diff the changed set
    // against the values actually present (k-value column-pruned probe)
    // and drop the stale stats subdirectories explicitly.
    val present = spark.read.parquet(tablePath)
      .filter(col(partCol).isin(changed: _*))
      .select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val gone = changed.map(String.valueOf).filterNot(present.contains)
    if (gone.nonEmpty) {
      import org.apache.hadoop.fs.Path
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val root = new Path(statsPath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      gone.foreach { v =>
        fs.delete(new Path(root, s"$partCol=${ExternalCatalogUtils.escapePathName(v)}"), true)
      }
    }
  }

  /** The current stats table (one row per partition). */
  def read(spark: SparkSession, statsPath: String): DataFrame =
    spark.read.parquet(statsPath)
}
