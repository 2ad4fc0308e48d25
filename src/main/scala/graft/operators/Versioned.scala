package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned snapshot table with time-travel reads — the table-format
  * layer the reference's overwrite-style sinks lack: every commit
  * produces a new queryable VERSION, historical versions stay readable
  * (audits, reproducible training runs, incremental diff), and storage
  * is shared across versions at file granularity.
  *
  * Design (Iceberg/Delta-flavored, minimal):
  *   - data lives in generation directories `gen/__gen=G/__p=<part>/`,
  *     written once and never mutated;
  *   - a manifest parquet per version (`manifest/v=N`, rows
  *     `(pval, gen)`) pins which generation serves each partition in
  *     that version — unaffected partitions carry their prior entry
  *     forward, so a commit writes ONLY the partitions its delta
  *     touches (O(delta), never O(table));
  *   - the manifest write IS the commit point: its `_SUCCESS` marker
  *     appears atomically, a crash anywhere earlier leaves an orphan
  *     generation no manifest references (invisible; retry overwrites
  *     it in place), so readers always see a complete version;
  *   - `readAsOf(v)` opens exactly the directories manifest `v` lists —
  *     cost O(version footprint), with partition pruning intact because
  *     each partition is its own directory.
  *
  * At 100 TB this is the production shape: commits touch affected
  * partitions only, time travel is a manifest lookup (k rows), and
  * `expire` reclaims generations no retained manifest references.
  * The real partition column is duplicated into the string dir key
  * `__p` (types survive in the data files; directory-name type
  * inference never bites).
  */
object Versioned {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = s"$path/manifest"
  private def manifestPath(path: String, v: Long) = s"${manifestDir(path)}/v=$v"
  private[graft] def genRoot(path: String) = s"$path/gen"
  private[graft] def partDir(path: String, pval: String, gen: Long) =
    s"${genRoot(path)}/__gen=$gen/__p=$pval"

  /** Retained versions (committed manifests still on disk), ascending. */
  private[graft] def retainedVersions(spark: SparkSession, path: String): Seq[Long] = {
    val fs = fsOf(spark, path)
    val dir = new Path(manifestDir(path))
    if (!fs.exists(dir)) Nil
    else
      fs.listStatus(dir).toSeq
        .map(_.getPath)
        .filter(p => p.getName.startsWith("v=") && fs.exists(new Path(p, "_SUCCESS")))
        .map(_.getName.stripPrefix("v=").toLong)
        .sorted
  }

  /** Latest committed version (0 = table absent). A manifest counts iff
    * its `_SUCCESS` marker exists — uncommitted crash leftovers don't. */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val fs = fsOf(spark, path)
    val dir = new Path(manifestDir(path))
    if (!fs.exists(dir)) 0L
    else
      fs.listStatus(dir).toSeq
        .map(_.getPath)
        .filter(p => p.getName.startsWith("v=") && fs.exists(new Path(p, "_SUCCESS")))
        .map(_.getName.stripPrefix("v=").toLong)
        .foldLeft(0L)(math.max)
  }

  /** Manifest-integrity audit (fsck): one row summarizing the health of
    * the version store — retained version count, distinct generation
    * directories the manifests reference, MISSING references (a
    * manifest points at a directory that no longer exists: readers of
    * that version will fail — the corruption that silent manual cleanup
    * or a botched restore causes), and ORPHAN directories (on disk but
    * referenced by no retained manifest: space [[expire]] should have
    * reclaimed, or debris from an interrupted commit before its marker).
    * Metadata-only: walks manifests (driver-sized by design) and ONE
    * directory listing — never the data. */
  def fsck(spark: SparkSession, path: String): (Long, Long, Long, Long) = {
    val fs = fsOf(spark, path)
    val retained = retainedVersions(spark, path)
    val refs: Set[(String, Long)] =
      retained.flatMap(v => manifestRefs(spark, path, v)).toSet
    val root = new Path(genRoot(path))
    val onDisk: Set[(String, Long)] =
      if (!fs.exists(root)) Set.empty
      else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { g =>
        val gen = g.getPath.getName.stripPrefix("__gen=").toLong
        fs.listStatus(g.getPath).toSeq.filter(_.isDirectory)
          .map(p => (p.getPath.getName.stripPrefix("__p="), gen))
      }.toSet
    (retained.size.toLong, refs.size.toLong,
      (refs -- onDisk).size.toLong, (onDisk -- refs).size.toLong)
  }

  private[graft] def manifestRefs(spark: SparkSession, path: String, v: Long): Seq[(String, Long)] =
    spark.read.parquet(manifestPath(path, v))
      .select(col("pval"), col("gen"))
      .collect() // k rows: one per partition — driver-sized by design
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Commit `delta` as the next version: merge-by-key into each affected
    * partition, carry every other partition's manifest entry forward.
    * Returns the committed version number. Crash-safe at every point
    * (see object doc) and idempotently retryable. */
  def commit(
      spark: SparkSession,
      path: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String]): Long = {
    val cur = latestVersion(spark, path)
    val next = cur + 1
    val prior: Seq[(String, Long)] =
      if (cur == 0) Nil else manifestRefs(spark, path, cur)

    val tagged = delta.withColumn("__p", col(partCol).cast("string"))
    // distinct partition values of the delta: bounded by the partition
    // domain (the same driver-side affected-set Upsert's partitioned
    // path uses), never by |delta|
    val affected: Seq[String] =
      tagged.select(col("__p")).distinct().collect().map(_.getString(0)).toSeq
    val affectedSet = affected.toSet

    val affectedBaseDirs = prior.collect {
      case (p, g) if affectedSet(p) => partDir(path, p, g)
    }
    val merged =
      if (affectedBaseDirs.isEmpty) tagged
      else {
        val base = spark.read
          .option("basePath", genRoot(path))
          .parquet(affectedBaseDirs: _*)
          .drop("__gen")
          .withColumn("__p", col("__p").cast("string"))
        Upsert.merge(base, tagged, keys)
      }
    // ONE job writes every affected partition under the new generation
    merged.write.mode(SaveMode.Overwrite).partitionBy("__p")
      .parquet(s"${genRoot(path)}/__gen=$next")

    val carried = prior.filterNot { case (p, _) => affectedSet(p) }
    val entries = carried ++ affected.map(_ -> next)
    import spark.implicits._
    // tiny (one row per partition); the _SUCCESS of this write commits
    entries.toDF("pval", "gen").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(manifestPath(path, next))
    next
  }

  /** Read the table exactly as of version `v` (defaults to latest). */
  def readAsOf(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, path) else version
    require(v > 0, s"no committed version at $path")
    val fs = fsOf(spark, path)
    require(fs.exists(new Path(manifestPath(path, v), "_SUCCESS")),
      s"version $v was never committed at $path")
    val dirs = manifestRefs(spark, path, v).map { case (p, g) => partDir(path, p, g) }
    spark.read.option("basePath", genRoot(path)).parquet(dirs: _*)
      .drop("__gen", "__p")
  }

  /** Drop all but the last `keep` versions and every generation
    * directory no retained manifest references. Readers of retained
    * versions are unaffected (their files are never touched). */
  def expire(spark: SparkSession, path: String, keep: Int): Unit = {
    require(keep >= 1)
    val fs = fsOf(spark, path)
    val latest = latestVersion(spark, path)
    if (latest == 0) return
    val retained = ((latest - keep + 1) max 1L) to latest
    val live: Set[(String, Long)] = retained
      .filter(v => fs.exists(new Path(manifestPath(path, v), "_SUCCESS")))
      .flatMap(v => manifestRefs(spark, path, v)).toSet

    val mDir = new Path(manifestDir(path))
    fs.listStatus(mDir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("v=") && n.stripPrefix("v=").toLong < retained.head)
        fs.delete(st.getPath, true)
    }
    val gRoot = new Path(genRoot(path))
    if (fs.exists(gRoot)) fs.listStatus(gRoot).foreach { gSt =>
      val gName = gSt.getPath.getName
      if (gName.startsWith("__gen=")) {
        val g = gName.stripPrefix("__gen=").toLong
        fs.listStatus(gSt.getPath)
          .filter(_.getPath.getName.startsWith("__p="))
          // `__p=x__new` / `__p=x__old` are Forget.scrubVersioned swap
          // residue from a crash window; between the two renames the
          // `__new` copy can be the partition's ONLY copy, so expire must
          // never reclaim them — the next scrub heals, then expire can.
          .filterNot(p => p.getPath.getName.endsWith("__new") ||
            p.getPath.getName.endsWith("__old"))
          .foreach { pSt =>
            val p = pSt.getPath.getName.stripPrefix("__p=")
            if (!live((p, g))) fs.delete(pSt.getPath, true)
          }
        // the generation root also holds Spark's _SUCCESS marker — the
        // generation is disposable once no partition dir remains
        if (!fs.listStatus(gSt.getPath).exists(_.getPath.getName.startsWith("__p=")))
          fs.delete(gSt.getPath, true)
      }
    }
  }
}
