package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MATERIALIZED AGGREGATE maintained TRANSACTIONALLY with its base
  * table — the index family's discipline ([[VersionedBloom]] /
  * [[VersionedZone]] / [[VersionedText]]) applied to a grouped
  * (count, sum) view: every base commit and the affected groups'
  * recomputed MV rows land in ONE [[Txn]], so there is no observable
  * state — crash windows included — where the view lags the table
  * (the refresh gap every external MV pipeline schedules around).
  *
  * Maintenance is RETRACTION-based and O(delta): an upsert replaces
  * rows by key, so the new MV row for a group is
  * `old_row + partial(delta's new images) − partial(replaced old
  * images)`. The old images come from a key-semi-join against the
  * pinned base snapshot — the DELTA's keys drive the probe, never a
  * view-side scan, and at 100 TB that read rides the same partition /
  * bloom pruning any point lookup does. Counts and sums retract
  * exactly; the sum stays in exact DECIMAL so a retraction can never
  * drift a float. Deletes are out of scope (pair [[Versioned.deleteKeys]]
  * with a view rebuild, or model deletes as zeroing upserts); a
  * negative post-retraction count fails loudly rather than shipping an
  * impossible view row.
  *
  * Read path: the view IS the answer — k rows, no base-table I/O. The
  * k61 gate bounds the executed plan's scan rows at the group count
  * and hash-proves view reads ≡ recomputed aggregates under churn.
  */
object VersionedMv {

  /** The (groupCols, n, s) MV rows for `delta`'s AFFECTED GROUPS as
    * they will stand after the commit. `asOfVersion` pins the base
    * snapshot the old images are read from; callers that commit the
    * result MUST pass the same version as the table write's
    * `expectedVersion` (see [[commitWithMv]]) — retracting against a
    * stale snapshot double-counts whatever an interleaved commit
    * already folded in. */
  def mvDelta(
      spark: SparkSession,
      tablePath: String,
      mvPath: String,
      delta: DataFrame,
      keys: Seq[String],
      groupCols: Seq[String],
      valCol: String,
      asOfVersion: Long = -1L): DataFrame = {
    val base =
      if (asOfVersion < 0) Versioned.latestVersion(spark, tablePath) else asOfVersion
    val gcols = groupCols.map(col)
    def partial(df: DataFrame, sign: Int): DataFrame =
      df.groupBy(gcols: _*)
        .agg((count(lit(1)) * sign).as("n"),
          (sum(col(valCol)) * sign).cast("decimal(30,2)").as("s"))
    val add = partial(delta, 1)
    val sub =
      if (base == 0) add.limit(0)
      else partial(
        Versioned.readAsOf(spark, tablePath, base)
          .join(delta.select(keys.map(col): _*).distinct(), keys, "left_semi"),
        -1)
    val affected = add.select(gcols: _*).unionByName(sub.select(gcols: _*)).distinct()
    val mvVersion = Versioned.latestVersion(spark, mvPath)
    val cur =
      if (mvVersion == 0) add.limit(0)
      else Versioned.readAsOf(spark, mvPath, mvVersion)
        .join(affected, groupCols, "left_semi")
        .select((gcols :+ col("n") :+ col("s")): _*)
    val next = cur.unionByName(add).unionByName(sub)
      .groupBy(gcols: _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).cast("decimal(30,2)").as("s"))
    // a negative count means a retraction keyed off the wrong snapshot
    // (or a delete routed through upsert) — refuse, never ship it
    next.withColumn("n",
      when(col("n") < 0, raise_error(concat(lit("VersionedMv: negative count for group "),
        concat_ws("/", gcols: _*)))).otherwise(col("n")))
  }

  /** Commit `delta` and its MV maintenance as one atomic transaction;
    * the pinned base rides as the table write's `expectedVersion`, so
    * an interleaving commit aborts with [[Txn.TxnConflictException]]
    * instead of double-counting. Returns the (table → version) map. */
  def commitWithMv(
      spark: SparkSession,
      txnDir: String,
      tablePath: String,
      mvPath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      groupCols: Seq[String],
      valCol: String,
      stamp: Option[Long] = None): Map[String, Long] = {
    val base = Versioned.latestVersion(spark, tablePath)
    Txn.run(spark, txnDir, Seq(
      Txn.Write(tablePath, delta, partCol, keys, stamp,
        expectedVersion = Some(base)),
      Txn.Write(mvPath,
        mvDelta(spark, tablePath, mvPath, delta, keys, groupCols, valCol,
          asOfVersion = base),
        groupCols.head, groupCols, stamp)))
  }

  /** The view, finished: (groupCols, n, total, avg) — k rows, zero
    * base-table I/O. A group FULLY evacuated by upsert churn (every
    * key moved elsewhere) persists in the MV table as an (n=0, s=0)
    * row — the incremental delta has nothing to delete with — so the
    * read filters zero-count rows: a recomputed GROUP BY aggregate has
    * no empty groups, and the contract is view reads ≡ recomputation.
    * The dead rows themselves are reclaimed by [[compact]]'s sweep. */
  def read(spark: SparkSession, mvPath: String, groupCols: Seq[String]): DataFrame =
    Versioned.readAsOf(spark, mvPath)
      .filter(col("n") =!= 0)
      .select((groupCols.map(col) :+ col("n") :+ col("s")): _*)

  /** MV MAINTENANCE: physically SWEEP evacuated groups, then compact
    * fragmentation. [[read]] filters (n=0) rows correctly, but without
    * a sweep every group ever evacuated leaves a dead row in the MV
    * table FOREVER — at churny-100-TB timescales the view degrades
    * toward the history of its group domain rather than its current
    * size. The sweep is the index family's own transactional delete
    * (staged-swap: affected partitions rewritten as a fresh generation,
    * fully-emptied partitions leave the manifest — a replace could
    * never drop those, its manifest carries unlisted partitions
    * forward), keyed by the zero rows' group columns; a reader pinned
    * to a prior version still sees the old layout. A second Txn then
    * re-lands fragmented partitions one-file-per-partition
    * ([[Versioned.compactPartitions]]). Returns the committed
    * (table → version) map — empty when the MV is already clean and
    * compact. An MV whose EVERY group evacuated inherits delete's
    * would-empty-the-table refusal (the empty view is a drop, not a
    * sweep). */
  def compact(
      spark: SparkSession,
      txnDir: String,
      mvPath: String,
      groupCols: Seq[String],
      minFiles: Int = 2): Map[String, Long] = {
    val gcols = groupCols.map(col)
    val zeros = Versioned.readAsOf(spark, mvPath)
      .filter(col("n") === 0)
      .select(gcols: _*)
    val swept =
      if (zeros.isEmpty) Map.empty[String, Long]
      else Txn.run(spark, s"$txnDir/sweep", Seq(
        Txn.Write(mvPath, zeros, partCol = groupCols.head, keys = groupCols,
          op = "delete")))
    swept ++ Versioned.compactPartitions(
      spark, s"$txnDir/files", mvPath, groupCols.head, minFiles)
  }
}
