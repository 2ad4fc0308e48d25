package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Keyed idempotent upsert — the Spark re-expression of the reference's
  * `INSERT ... ON CONFLICT (keys) DO UPDATE` sinks (K1-K6,
  * reference: src/etl-square-payments.ts:59-117 and siblings).
  *
  * Contract: at-least-once input + keyed upsert ⇒ effectively-once table
  * (SURVEY.md §2.7). `upsert(t); upsert(t)` ≡ `upsert(t)`.
  *
  * Scale design: the merge is a single shuffle on the upsert key
  * (left_anti join); with a partitioned table only the partitions touched
  * by the delta are rewritten (dynamic partition overwrite), so cost is
  * O(delta ∪ affected partitions), not O(table) — the property that makes
  * hourly incremental runs viable at 100 TB.
  */
object Upsert {

  /** Pure merge: rows of `delta` replace rows of `base` sharing the same
    * key; all other base rows pass through. Exactly ON CONFLICT DO UPDATE
    * semantics when `delta` is key-unique.
    */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val d = delta.select(base.columns.map(col).toIndexedSeq: _*)
    d.unionByName(base.join(d.select(keys.map(col).toIndexedSeq: _*).distinct(), keys, "left_anti"))
  }

  /** Schema-evolving merge: the result schema is the union of base and
    * delta columns; rows from the side missing a column get NULL there
    * (additive evolution only — the common case for feeds that grow
    * fields over time). Delta still wins on key conflicts.
    */
  def mergeEvolve(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val baseKeep = base.join(
      delta.select(keys.map(col).toIndexedSeq: _*).distinct(), keys, "left_anti")
    delta.unionByName(baseKeep, allowMissingColumns = true)
  }

  /** Collapse a delta that may carry several versions of one key to the
    * latest version per key, deterministically: greatest `versionCol`,
    * ties broken by the remaining columns' order. The reference's analog
    * is first-wins insertion order (J1, src/etl-square-orders.ts:181-193);
    * for upserts last-write-wins is the useful direction.
    */
  def latestPerKey(delta: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(col(versionCol).desc)
    delta.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Upsert `delta` into the parquet table at `path` (creating it if
    * absent). When `partitionBy` is set, only partitions present in the
    * delta are read+rewritten (dynamic overwrite); unpartitioned tables
    * are rewritten whole via write-temp-then-swap for atomicity without a
    * transaction log (SURVEY.md §7.4 hard part #1).
    */
  def upsertParquet(
      spark: SparkSession,
      path: String,
      delta: DataFrame,
      keys: Seq[String],
      partitionBy: Seq[String] = Nil): Unit = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(fsPath)

    if (!exists) {
      val w = delta.write.mode(SaveMode.Overwrite)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
      return
    }

    if (partitionBy.nonEmpty) {
      // Only touch partitions the delta lands in.
      val affected = delta.select(partitionBy.map(col).toIndexedSeq: _*).distinct()
      val base = spark.read.parquet(path).join(broadcast(affected), partitionBy, "left_semi")
      val merged = merge(base, delta, keys).localCheckpoint(true)
      merged.write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionBy: _*)
        .parquet(path)
    } else {
      val base = spark.read.parquet(path)
      // localCheckpoint materializes the merge before we clobber its input.
      val merged = merge(base, delta, keys).localCheckpoint(true)
      val tmp = new org.apache.hadoop.fs.Path(path + "__tmp_upsert")
      fs.delete(tmp, true)
      merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      fs.delete(fsPath, true)
      fs.rename(tmp, fsPath)
    }
  }
}
