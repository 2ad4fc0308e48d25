package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Cluster-safe scratch-space provider for every staging site in the
  * engine (iterative-round restaging, stream checkpoints, versioned-table
  * fixtures). Replaces driver-local `Files.createTempDirectory`, which is
  * only correct when the driver's local disk IS the Spark write path: on a
  * real cluster with an HDFS/object-store `fs.defaultFS`, a local mkdir
  * gives no uniqueness or cleanup guarantee for the path the executors
  * actually write.
  *
  * Contract:
  *   - root comes from `spark.graft.scratch.root` (any Hadoop-visible
  *     scheme: `hdfs://…`, `s3a://…`, `file:/…`). When unset, falls back
  *     to the driver's `java.io.tmpdir` ONLY in `local[*]` mode — on a
  *     cluster master an unset root fails loudly instead of silently
  *     staging to the driver's disk.
  *   - every allocation is run-scoped and unique:
  *     `<root>/graft-scratch/<applicationId>/<tag>-<uuid>`. The
  *     applicationId level means two concurrent apps sharing a root never
  *     collide; the uuid level means two allocations in one app never do.
  *   - directories are created through the path's own `FileSystem`, so
  *     the mkdir happens where the writes will land, not on the driver.
  *   - cleanup: the whole `<root>/graft-scratch/<applicationId>` subtree
  *     is deleted once, at application end (a listener registered on
  *     first use). Per-query eager deletion would be unsound here —
  *     returned DataFrames read the staged parquet lazily, so the files
  *     must outlive the query function. Sites that DO fully materialize
  *     can free early with [[cleanup]].
  */
object Scratch {

  val RootKey = "spark.graft.scratch.root"
  private val Namespace = "graft-scratch"

  /** appIds whose end-of-app cleanup listener is already registered. */
  private val registered = ConcurrentHashMap.newKeySet[String]()

  /** Allocate a fresh run-scoped scratch directory for the thread's
    * active session. `tag` is a human-readable label that shows up in
    * the path (debuggability), not a uniqueness mechanism. */
  def dir(tag: String): String = dir(SparkSession.active, tag)

  def dir(spark: SparkSession, tag: String): String = {
    val p = new Path(runRoot(spark), s"${sanitize(tag)}-${java.util.UUID.randomUUID().toString.take(13)}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    registerCleanup(spark)
    fs.makeQualified(p).toString
  }

  /** The run-scoped root for this application:
    * `<root>/graft-scratch/<applicationId>`. */
  def runRoot(spark: SparkSession): Path =
    new Path(new Path(configuredRoot(spark), Namespace), spark.sparkContext.applicationId)

  /** Deterministic CROSS-RUN cache location for landed artifacts (the
    * shared graph mirrors, entity-label tables, …):
    * `<root>/graft-cache/<name>` → `(qualified path, already landed)`,
    * where landed means the artifact's `_SUCCESS` marker exists —
    * probed through the path's OWN FileSystem, so the check and the
    * Spark write agree on a cluster (a driver-local `java.io.File`
    * probe would check the driver's disk while the schemeless write
    * resolves against `fs.defaultFS`). Not run-scoped and never
    * auto-cleaned: landed artifacts are shared across runs by design. */
  def cache(spark: SparkSession, name: String): (String, Boolean) = {
    val p = new Path(new Path(configuredRoot(spark), "graft-cache"), sanitize(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs.makeQualified(p).toString, fs.exists(new Path(p, "_SUCCESS")))
  }

  /** Best-effort eager delete for sites that have fully materialized
    * their results and can free staging before application end. */
  def cleanup(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    } catch { case _: java.io.IOException => () } // best-effort by contract
  }

  private def configuredRoot(spark: SparkSession): Path = {
    val conf = spark.conf.getOption(RootKey)
      .orElse(spark.sparkContext.getConf.getOption(RootKey))
    conf match {
      case Some(r) if r.nonEmpty => new Path(r)
      case _ =>
        val master = spark.sparkContext.master
        if (master.startsWith("local")) new Path(System.getProperty("java.io.tmpdir"))
        else throw new IllegalStateException(
          s"$RootKey is not set and master '$master' is not local: staging would " +
            "silently land on the driver's local disk while Spark writes resolve " +
            "against fs.defaultFS. Set spark.graft.scratch.root to a cluster-visible " +
            "path (hdfs://…, s3a://…).")
    }
  }

  /** One listener per application: drop the whole run subtree when the
    * app ends. Idempotent across sessions sharing a SparkContext. */
  private def registerCleanup(spark: SparkSession): Unit = {
    val appId = spark.sparkContext.applicationId
    if (registered.add(appId)) {
      val root = runRoot(spark)
      val hconf = spark.sparkContext.hadoopConfiguration
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          try {
            val fs: FileSystem = root.getFileSystem(hconf)
            fs.delete(root, true)
          } catch { case _: java.io.IOException => () }
        }
      })
    }
  }

  private def sanitize(tag: String): String =
    tag.replaceAll("[^A-Za-z0-9._-]", "-")

  /** Eager round-staging for iterative operators: round k's parquet
    * supersedes round k−`window`, which is deleted as soon as the new
    * round has durably landed (the write is synchronous). Bounds scratch
    * growth to `window` round tables per chain instead of one per
    * iteration — over a multi-pass whole-registry run the difference is
    * every iterative query's full round history on disk.
    *
    * `window` = 1 when only the latest round is referenced (BFS labels,
    * Katz scores, truss peels); 2 when the loop still reads the previous
    * round after staging the next (Bellman-Ford's improvement probe).
    * Frames that stay referenced across rounds (a nodes table, MS-BFS
    * frontier levels consumed by the final expansion) must NOT go
    * through a chain — stage them plainly and free them explicitly (or
    * let app-end cleanup take them). */
  final class RoundChain(spark: SparkSession, window: Int = 1) {
    private val live = scala.collection.mutable.Queue.empty[String]

    /** Write `df` to `path`, read it back, and drop any chain entry
      * older than `window` rounds.
      *
      * Every stage is PLAN-LINTED before it executes
      * ([[graft.plans.PlanLint.assertStagedScales]]): the registry-wide
      * lint sees only returned frames, and round 10 proved a
      * scale-killer can hide behind a staged write. A deliberately
      * bounded single-task fold must declare its bound —
      * `boundedRows > 0` skips the partition-less-window rule and
      * instead verifies (via an Observation riding the write, no extra
      * job) that the staged row count honors the declared bound. */
    def stage(
        df: org.apache.spark.sql.DataFrame,
        path: String,
        boundedRows: Long = 0L): org.apache.spark.sql.DataFrame = {
      if (boundedRows <= 0L) {
        graft.plans.PlanLint.assertStagedScales(df)
        df.write.mode("overwrite").parquet(path)
      } else {
        val obs = org.apache.spark.sql.Observation()
        df.observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows"))
          .write.mode("overwrite").parquet(path)
        val n = obs.get("rows").asInstanceOf[Long]
        require(n <= boundedRows,
          s"stage($path) declared boundedRows=$boundedRows but wrote $n rows — " +
            "the single-task fold this bound was meant to cap is unbounded")
      }
      live.enqueue(path)
      while (live.size > window) cleanup(spark, live.dequeue())
      spark.read.parquet(path)
    }
  }
}
