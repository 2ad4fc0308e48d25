package graft

import org.apache.spark.sql.functions._
import graft.operators.{Versioned, VersionedBloom}

/** Transactionally-maintained secondary index: lookup ≡ full scan,
  * index content tracks key MOVES immediately (no refresh-job window),
  * candidate partitions genuinely prune, versions move in lockstep. */
class VersionedBloomSpec extends SparkSpec {

  import spark.implicits._

  private def fixture() = {
    val root = java.nio.file.Files.createTempDirectory("graft-vbloom").toString
    val tbl = s"$root/t"; val idx = s"$root/i"
    // 300 rows over 3 partitions; secondary key ck clusters per partition
    // (ck = 1000*part + i) so a point lookup should prune to ONE partition
    val base = (1 to 300)
      .map(i => (i.toLong, s"p${i % 3}", (i % 3) * 1000L + i / 3, i.toLong))
      .toDF("k", "part", "ck", "amount")
    VersionedBloom.commitIndexed(spark, s"$root/tx1", tbl, idx, base,
      "part", Seq("k"), "ck")
    (root, tbl, idx, base)
  }

  test("index-pruned lookup equals full scan + filter") {
    val (_, tbl, idx, _) = fixture()
    val keys = Seq(7L, 1042L, 2099L, 999999L)
    val pruned = VersionedBloom.lookup(spark, tbl, idx, "ck", keys)
      .collect().map(_.toString).sorted.toSeq
    val full = Versioned.readAsOf(spark, tbl)
      .filter(col("ck").isin(keys: _*))
      .collect().map(_.toString).sorted.toSeq
    assert(pruned === full)
    assert(pruned.nonEmpty, "probe keys must exist in the fixture")
  }

  test("candidate partitions prune: a clustered key opens one partition") {
    val (_, _, idx, _) = fixture()
    val cand = VersionedBloom.candidatePartitions(spark, idx, Seq(2050L))
    assert(cand.size < 3, s"expected pruning below all 3 partitions, got $cand")
  }

  test("a key MOVE is visible through the index in the same commit") {
    val (root, tbl, idx, base) = fixture()
    // move row k=30's ck into a fresh value no other row has
    val delta = base.filter(col("k") === 30L)
      .withColumn("ck", lit(777777L))
    VersionedBloom.commitIndexed(spark, s"$root/tx2", tbl, idx, delta,
      "part", Seq("k"), "ck")
    val atNew = VersionedBloom.lookup(spark, tbl, idx, "ck", Seq(777777L))
      .select(col("k")).collect().map(_.getLong(0)).toSeq
    assert(atNew === Seq(30L), "moved key found via its NEW secondary value")
    val oldCk = base.filter(col("k") === 30L).select(col("ck"))
      .collect().head.getLong(0)
    val atOld = VersionedBloom.lookup(spark, tbl, idx, "ck", Seq(oldCk))
      .filter(col("k") === 30L).count()
    assert(atOld === 0L, "moved key no longer reachable via its OLD value")
    assert(Versioned.latestVersion(spark, tbl) ===
      Versioned.latestVersion(spark, idx), "versions move in lockstep")
  }

  test("absent key returns empty, never an error") {
    val (_, tbl, idx, _) = fixture()
    assert(VersionedBloom.lookup(spark, tbl, idx, "ck", Seq(123456789L)).count() === 0L)
  }
}
