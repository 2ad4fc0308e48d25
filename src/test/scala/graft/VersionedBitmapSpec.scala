package graft

import org.apache.spark.sql.functions._
import graft.operators.{Versioned, VersionedBitmap}

/** Transactionally-maintained per-partition category bitmap: absence is
  * proven (a partition without the category's bits is never opened),
  * presence is conservative (the residual filter restores exactness),
  * category churn moves the index in the same commit, and versions
  * stay in lockstep. */
class VersionedBitmapSpec extends SparkSpec {

  import spark.implicits._

  private def fixture() = {
    val root = java.nio.file.Files.createTempDirectory("graft-vbm").toString
    val tbl = s"$root/t"; val idx = s"$root/bm"
    // partition p0 holds {red, blue}; p1 holds {blue}; p2 holds {green}
    val base = Seq(
      (1L, "p0", "red", 10), (2L, "p0", "blue", 20), (3L, "p0", "red", 30),
      (4L, "p1", "blue", 40), (5L, "p1", "blue", 50),
      (6L, "p2", "green", 60)
    ).toDF("k", "part", "cat", "v")
    VersionedBitmap.commitIndexed(spark, s"$root/tx1", tbl, idx, base,
      "part", Seq("k"), "cat")
    (root, tbl, idx)
  }

  test("candidates localize a category; absence is proven") {
    val (_, _, idx) = fixture()
    assert(VersionedBitmap.candidatePartitions(spark, idx, lit("green"))
      === Seq("p2"))
    val red = VersionedBitmap.candidatePartitions(spark, idx, lit("red"))
    assert(red.contains("p0") && !red.contains("p2"))
    // a category NO partition holds resolves to zero candidates
    assert(VersionedBitmap.candidatePartitions(spark, idx, lit("mauve")).isEmpty)
  }

  test("lookupEq equals full-scan-and-filter, opening only candidates") {
    val (_, tbl, idx) = fixture()
    val pruned = VersionedBitmap.lookupEq(spark, tbl, idx, "cat", lit("blue"))
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    val full = Versioned.readAsOf(spark, tbl).filter(col("cat") === "blue")
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(pruned === full && full === Seq(2L, 4L, 5L))
  }

  test("category churn moves the index in the same transaction") {
    val (root, tbl, idx) = fixture()
    // re-tag p2's row green -> red: p2 must start answering 'red'
    val delta = Seq((6L, "p2", "red", 61)).toDF("k", "part", "cat", "v")
    VersionedBitmap.commitIndexed(spark, s"$root/tx2", tbl, idx, delta,
      "part", Seq("k"), "cat")
    val red = VersionedBitmap.candidatePartitions(spark, idx, lit("red"))
    assert(red.toSet === Set("p0", "p2"))
    // green left with the only green row — p2's rebuilt bitmap dropped it
    assert(VersionedBitmap.candidatePartitions(spark, idx, lit("green")).isEmpty)
    assert(Versioned.latestVersion(spark, tbl)
      === Versioned.latestVersion(spark, idx))
    val rows = VersionedBitmap.lookupEq(spark, tbl, idx, "cat", lit("red"))
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(rows === Seq(1L, 3L, 6L))
  }
}
