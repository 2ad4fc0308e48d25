package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Atomic MULTI-TABLE publish: a run's table snapshots become visible
  * together or not at all — the parquet analog of the reference's
  * one-transaction-per-run visibility
  * (/root/reference/src/etl-square-payments.ts runs every sink inside a
  * single DB transaction), generalized across tables.
  *
  * Layout: each run stages every table under `runs/run=N/<table>/`;
  * the COMMIT POINT is one zero-byte marker `commits/run=N` created
  * with overwrite=false after every table's parquet (with its own
  * `_SUCCESS`) is durable. Readers resolve `latestCommitted` and open
  * that run's directories only — a crash anywhere before the marker
  * leaves a partial run no reader ever sees, and a retry re-stages the
  * same run id in place (Overwrite) before committing. Single writer
  * per root (the run-id allocation is not a lock); concurrent readers
  * are always consistent because published runs are immutable.
  *
  * At 100 TB: staging cost is the writes themselves (each table lands
  * once, fully parallel), the commit is one filesystem create, readers
  * pay zero coordination, and old runs remain for time travel/audit
  * until [[expire]] reclaims them.
  */
object Publish {

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] def runDir(root: String, run: Long) = s"$root/runs/run=$run"
  private def marker(root: String, run: Long) = new Path(s"$root/commits/run=$run")

  /** All committed (marker present) runs still on disk, ascending. */
  private[graft] def committedRuns(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val dir = new Path(s"$root/commits")
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("run=") => n.stripPrefix("run=").toLong }
      .sorted
  }

  /** Latest run whose commit marker exists (0 = nothing published). */
  def latestCommitted(spark: SparkSession, root: String): Long = {
    val fs = fsOf(spark, root)
    val dir = new Path(s"$root/commits")
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("run=") => n.stripPrefix("run=").toLong }
      .foldLeft(0L)(math.max)
  }

  /** Stage every table of the next run durably WITHOUT committing.
    * Exposed separately so crash windows are testable; production
    * callers use [[publish]]. Returns the staged run id. */
  def stageRun(
      spark: SparkSession, root: String, tables: Map[String, DataFrame]): Long = {
    require(tables.nonEmpty, "nothing to publish")
    val run = latestCommitted(spark, root) + 1
    tables.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"${runDir(root, run)}/$name")
    }
    run
  }

  /** Make a staged run visible: one atomic marker create. */
  def commitRun(spark: SparkSession, root: String, run: Long): Unit = {
    val fs = fsOf(spark, root)
    fs.mkdirs(new Path(s"$root/commits"))
    // overwrite=false: a second committer of the same run fails loudly
    val out = fs.create(marker(root, run), false)
    out.close()
  }

  /** Stage + commit: all tables become visible together. */
  def publish(
      spark: SparkSession, root: String, tables: Map[String, DataFrame]): Long = {
    val run = stageRun(spark, root, tables)
    commitRun(spark, root, run)
    run
  }

  /** Read `table` as of `run` (default: latest committed). Throws if
    * nothing was ever committed. */
  def read(
      spark: SparkSession, root: String, table: String, run: Long = -1L): DataFrame = {
    val r = if (run > 0) run else latestCommitted(spark, root)
    require(r > 0, s"no committed run under $root")
    spark.read.parquet(s"${runDir(root, r)}/$table")
  }

  /** Drop runs older than `keepLast` committed runs (markers last, so a
    * crash mid-expire never orphans a still-referenced run). */
  def expire(spark: SparkSession, root: String, keepLast: Int): Unit = {
    val fs = fsOf(spark, root)
    val latest = latestCommitted(spark, root)
    val cutoff = latest - keepLast.toLong + 1
    (1L until cutoff).foreach { r =>
      fs.delete(new Path(runDir(root, r)), true)
      fs.delete(marker(root, r), false)
    }
  }
}
