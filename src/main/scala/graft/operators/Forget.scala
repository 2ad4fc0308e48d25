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
}
