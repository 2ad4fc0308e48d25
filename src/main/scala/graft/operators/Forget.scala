package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed hard-delete ("right to be forgotten") over landed parquet
  * tables, with an audit report.
  *
  * Design for 100 TB: the forget set is tiny (a user list), so it
  * broadcasts everywhere it appears. On a partitioned table only the
  * partitions that actually CONTAIN a forgotten key are rewritten — the
  * affected set is found with one broadcast semi join, survivors are
  * staged durably (reusing [[Upsert]]'s stage-then-dynamic-overwrite
  * machinery and its crash recovery), and partitions left empty by the
  * scrub are removed explicitly (dynamic overwrite cannot express "this
  * partition is now empty"). Cost is O(affected partitions), never
  * O(table) — the deletion analog of Scd2.applyDelta's O(delta)
  * discipline. Unpartitioned tables fall back to one staged-swap
  * rewrite.
  *
  * Idempotence is the crash story: every window (before stage, mid
  * overwrite — healed by Upsert's recovery — or mid empty-partition
  * cleanup) leaves a table where re-running the same scrub converges to
  * the same state, because forgotten keys still match the forget set.
  */
object Forget {

  /** Result of one scrub: matched row count removed, rows left. */
  final case class Report(rowsRemoved: Long, rowsRemaining: Long)

  /** Minimal replica of Hive/Spark partition-path escaping for the
    * characters that would corrupt a `col=value` directory name. */
  private[graft] def escapePart(v: String): String =
    v.flatMap { c =>
      if (c.isLetterOrDigit || "-_.".contains(c)) c.toString
      else f"%%${c.toInt}%02X"
    }

  def scrub(
      spark: SparkSession,
      path: String,
      forgetKeys: DataFrame,
      keyCols: Seq[String],
      partitionBy: Seq[String] = Nil): Report = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Upsert.recoverSwap(fs, path)
    if (partitionBy.nonEmpty) Upsert.recoverPartitionedStage(spark, path, partitionBy)

    val keys = broadcast(forgetKeys.select(keyCols.map(col).toIndexedSeq: _*).distinct())
    val base = spark.read.parquet(path)

    // counts taken BEFORE any mutation: the base frame is lazy and would
    // re-list the rewritten files afterwards
    val total = base.count()

    if (partitionBy.isEmpty) {
      val removed = base.join(keys, keyCols, "left_semi").count()
      if (removed > 0)
        Upsert.stagedRewrite(spark, path)(b => b.join(keys, keyCols, "left_anti"))
      Report(removed, total - removed)
    } else {
      // partitions that contain at least one forgotten row (small: one
      // row per affected partition value)
      val affected = base.join(keys, keyCols, "left_semi")
        .select(partitionBy.map(col).toIndexedSeq: _*).distinct().collect()
      if (affected.isEmpty) return Report(0L, total)

      val affectedDf = broadcast(
        spark.createDataFrame(
          spark.sparkContext.parallelize(affected.toIndexedSeq, 1),
          org.apache.spark.sql.types.StructType(
            partitionBy.map(c => base.schema(c)))))
      val slice = base.join(affectedDf, partitionBy, "left_semi")
      val removed = slice.join(keys, keyCols, "left_semi").count()
      val survivors = slice.join(keys, keyCols, "left_anti")

      // stage + dynamic overwrite for partitions that still have rows
      val surviving = survivors
        .select(partitionBy.map(col).toIndexedSeq: _*).distinct().collect().toSet
      if (surviving.nonEmpty) {
        val stage = new org.apache.hadoop.fs.Path(path + "__stage")
        fs.delete(stage, true)
        survivors.write.mode(SaveMode.Overwrite).parquet(stage.toString)
        Upsert.applyPartitionedStage(spark, path, partitionBy)
      }
      // partitions the scrub emptied entirely: drop their directories
      // (idempotent — a crash mid-cleanup is healed by re-running)
      affected.filterNot(surviving).foreach { row =>
        val dir = partitionBy.zipWithIndex
          .map { case (c, i) => s"$c=${escapePart(String.valueOf(row.get(i)))}" }
          .mkString("/")
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/$dir"), true)
      }
      Report(removed, total - removed)
    }
  }

  /** Scrub forgotten keys from EVERY retained [[Versioned]] generation —
    * the scrub-through-history half of right-to-be-forgotten. [[scrub]]
    * cleans a live table, but a `Versioned` root retains prior
    * generations for time travel: without this, a forgotten key survives
    * in history until `expire` happens to drop the generation.
    *
    * Design: generation data is normally write-once; GDPR scrub is the
    * sanctioned exception, and it rewrites IN PLACE (same (gen, pval)
    * directory) so every manifest that references the directory — there
    * can be several, because unaffected partitions carry entries forward
    * across versions — is scrubbed by one rewrite. Affected directories
    * are found with ONE scan+broadcast-semi-join over the union of live
    * directories (partition columns `__gen`/`__p` come free from the
    * directory names), so cost is O(retained footprint scanned once +
    * affected dirs rewritten), never O(versions × table). Each rewrite
    * goes through [[Upsert.stagedRewrite]]'s staged-swap protocol and its
    * crash recovery, healed per-directory on the next call; re-running
    * after any crash window converges (forgotten keys still match).
    */
  def scrubVersioned(
      spark: SparkSession,
      path: String,
      forgetKeys: DataFrame,
      keyCols: Seq[String]): Report = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retained = Versioned.retainedVersions(spark, path)
    if (retained.isEmpty) return Report(0L, 0L)

    // every (pval, gen) directory any retained manifest references
    val live: Seq[(String, Long)] = retained
      .flatMap(v => Versioned.manifestRefs(spark, path, v)).distinct
    val liveDirs = live.map { case (p, g) => Versioned.partDir(path, p, g) }

    // A shallow clone serves some refs from the SOURCE's directories;
    // scrubbing those in place would mutate a table we don't own (and
    // silently scrub the source's history). Refuse until the caller
    // localizes the data — the honest answer for shared storage.
    Versioned.sourcePath(spark, path).foreach { src =>
      val shared = live.filterNot { case (p, g) =>
        fs.exists(new org.apache.hadoop.fs.Path(Versioned.partDir(path, p, g)))
      }
      require(shared.isEmpty,
        s"cannot scrub shallow clone $path: ${shared.size} partition dirs " +
          s"are still shared with source $src — run Versioned.materialize " +
          "(and expire pre-materialize versions), or scrub the source table")
    }

    // heal any interrupted prior scrub BEFORE listing/reading
    liveDirs.foreach(d => Upsert.recoverSwap(fs, d))

    val keys = broadcast(forgetKeys.select(keyCols.map(col).toIndexedSeq: _*).distinct())
    val union = spark.read
      .option("basePath", Versioned.genRoot(path))
      .parquet(liveDirs: _*)
    val total = union.count()
    // one job finds the affected directories and the per-dir match count
    val affected = union.join(keys, keyCols, "left_semi")
      .groupBy(col("__gen"), col("__p"))
      .agg(count(lit(1)).as("__n"))
      .collect() // one row per affected directory — driver-sized by design
    var removed = 0L
    affected.foreach { row =>
      val dir = Versioned.partDir(path,
        String.valueOf(row.get(row.fieldIndex("__p"))),
        row.getAs[Number]("__gen").longValue())
      removed += row.getAs[Long]("__n")
      Upsert.stagedRewrite(spark, dir)(b => b.join(keys, keyCols, "left_anti"))
    }
    Report(removed, total - removed)
  }

  /** Scrub forgotten keys from every committed [[Publish]] run that
    * still exists under `root`. Tables lacking one of `keyCols` are
    * skipped (they cannot contain the keyed rows). Published runs are
    * normally immutable; as with [[scrubVersioned]], the GDPR scrub is
    * the sanctioned in-place exception, staged-swap per table directory,
    * crash-healed on the next call, idempotent on re-run.
    */
  def scrubPublished(
      spark: SparkSession,
      root: String,
      forgetKeys: DataFrame,
      keyCols: Seq[String]): Report = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keys = broadcast(forgetKeys.select(keyCols.map(col).toIndexedSeq: _*).distinct())
    var removed = 0L
    var remaining = 0L
    Publish.committedRuns(spark, root).foreach { run =>
      val rd = new org.apache.hadoop.fs.Path(Publish.runDir(root, run))
      if (fs.exists(rd)) fs.listStatus(rd).foreach { st =>
        val tbl = st.getPath.toString
        // heal any interrupted prior scrub of this table directory first
        if (!st.getPath.getName.endsWith("__new") && !st.getPath.getName.endsWith("__old")) {
          Upsert.recoverSwap(fs, tbl)
          val df = spark.read.parquet(tbl)
          if (keyCols.forall(df.columns.contains)) {
            val m = df.join(keys, keyCols, "left_semi").count()
            if (m > 0) {
              Upsert.stagedRewrite(spark, tbl)(b => b.join(keys, keyCols, "left_anti"))
              removed += m
              remaining += spark.read.parquet(tbl).count()
            } else remaining += df.count()
          } else remaining += df.count()
        }
      }
    }
    Report(removed, remaining)
  }
}
