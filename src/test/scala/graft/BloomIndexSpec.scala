package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.BloomIndex

/** File-level bloom index: skip ratio on unclustered layouts, the
  * conservative (false-positive-only) membership contract, and pruned
  * read ≡ full scan. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def landed(nFiles: Int, rowsPerKey: Int = 3, nKeys: Int = 200): (String, String) = {
    val root = Files.createTempDirectory("graft-bloom").toString
    val tbl = s"$root/t"
    (1 to nKeys).flatMap(k => (1 to rowsPerKey).map(r => (k.toLong, s"v$k-$r")))
      .toDF("k", "payload")
      .repartition(nFiles) // round-robin: every file spans the key domain
      .write.parquet(tbl)
    BloomIndex.build(spark, tbl, "k", s"$root/idx")
    (tbl, s"$root/idx")
  }

  test("point lookup opens few files on an unclustered layout and equals the full scan") {
    val (tbl, idx) = landed(nFiles = 16)
    val cand = BloomIndex.candidateFiles(spark, idx, Seq(7L))
    // key 7 has 3 rows → at most 3 true files + bloom false positives;
    // the point is it's nowhere near all 16 (a zone map prunes ZERO here)
    assert(cand.nonEmpty && cand.size <= 8,
      s"expected heavy pruning, got ${cand.size}/16 files")
    val viaIndex = BloomIndex.lookup(spark, tbl, idx, "k", Seq(7L, 113L))
      .as[(Long, String)].collect().toSet
    val fullScan = spark.read.parquet(tbl).filter(col("k").isin(7L, 113L))
      .as[(Long, String)].collect().toSet
    assert(viaIndex === fullScan && viaIndex.size === 6)
  }

  test("an absent key yields no rows; false positives only cost file opens") {
    val (tbl, idx) = landed(nFiles = 16)
    // absent key: bloom may admit a few files (fp), but the exact
    // re-filter guarantees zero rows — conservative, never wrong
    assert(BloomIndex.lookup(spark, tbl, idx, "k", Seq(999999L)).count() === 0)
  }

  test("non-BIGINT key columns prune without false negatives") {
    // the regression class: xxhash64 is type-sensitive, so hashing an
    // INT/DECIMAL key in its native type at build while probing LongType
    // yields disjoint positions → zero candidates → silently missing
    // rows. Both sides now hash through an explicit cast-to-long.
    for (cast <- Seq("int", "decimal(10,0)", "string")) {
      val root = Files.createTempDirectory(s"graft-bloom-$cast".replace("(", "-").replace(",", "-").replace(")", "")).toString
      val tbl = s"$root/t"
      (1 to 100).map(k => (k.toLong, s"v$k")).toDF("k", "payload")
        .withColumn("k", col("k").cast(cast))
        .repartition(8).write.parquet(tbl)
      BloomIndex.build(spark, tbl, "k", s"$root/idx")
      val got = BloomIndex.lookup(spark, tbl, s"$root/idx", "k", Seq(42L))
        .select(col("payload")).as[String].collect().toSeq
      assert(got === Seq("v42"), s"keyCol type $cast lost the row: $got")
    }
  }

  test("rebuild after the file set changes keeps lookups exact") {
    val (tbl, idx) = landed(nFiles = 4)
    Seq((777L, "late")).toDF("k", "payload")
      .write.mode("append").parquet(tbl)
    // stale index: 777 unknown to every indexed file → zero candidates.
    // The contract is rebuild-after-change (same as any file-stat index).
    assert(BloomIndex.lookup(spark, tbl, idx, "k", Seq(777L)).count() === 0)
    BloomIndex.build(spark, tbl, "k", idx)
    assert(BloomIndex.lookup(spark, tbl, idx, "k", Seq(777L))
      .as[(Long, String)].collect().toSet === Set((777L, "late")))
  }
}
