package graft

import org.apache.spark.sql.functions._
import graft.operators.{Versioned, VersionedZone}

/** Transactionally-maintained range (zone) index: range lookup ≡ full
  * scan + filter, pruning is real and conservative (NULLs safe), and a
  * commit that moves values updates the zone rows in the same
  * transaction — no refresh-lag window exists. */
class VersionedZoneSpec extends SparkSpec {

  import spark.implicits._

  private def fixture() = {
    val root = java.nio.file.Files.createTempDirectory("graft-vzone").toString
    val tbl = s"$root/t"; val idx = s"$root/z"
    // 300 rows over 3 partitions; value ranges cluster per partition
    // (v in [1000p, 1000p+99]) so a range probe prunes to one partition;
    // partition p2 also carries NULL values (conservative-pruning path)
    val base = (0 until 300).map { i =>
      val p = i % 3
      val v: java.lang.Long =
        if (p == 2 && i % 30 == 2) null else java.lang.Long.valueOf(1000L * p + i / 3)
      (i.toLong, s"p$p", v, i.toLong)
    }.toDF("k", "part", "v", "amount")
    VersionedZone.commitIndexed(spark, s"$root/tx1", tbl, idx, base,
      "part", Seq("k"), "v")
    (root, tbl, idx, base)
  }

  test("range lookup equals full scan + filter, including the NULL-carrying partition") {
    val (_, tbl, idx, _) = fixture()
    val (lo, hi) = (lit(2010L), lit(2060L))
    val pruned = VersionedZone.lookupRange(spark, tbl, idx, "v", lo, hi)
      .collect().map(_.toString).sorted.toSeq
    val full = Versioned.readAsOf(spark, tbl)
      .filter(col("v") >= 2010L && col("v") <= 2060L)
      .collect().map(_.toString).sorted.toSeq
    assert(pruned === full)
    assert(pruned.nonEmpty, "the probe range must hit fixture rows")
  }

  test("candidates genuinely prune: a one-partition range opens one partition") {
    val (_, tbl, idx, _) = fixture()
    assert(VersionedZone.candidatePartitions(spark, idx, lit(1010L), lit(1020L))
      === Seq("p1"))
    // a range between the partitions' value bands matches nothing
    assert(VersionedZone.candidatePartitions(spark, idx, lit(150L), lit(900L))
      .isEmpty)
    // EXECUTED-plan evidence: the pruned read touches at most p1's 100
    // rows (zone pruning keeps the other 200 rows' files unopened; the
    // pushed range filter then trims within the partition — both
    // layers measured here as emitted scan rows well under the table)
    val metrics = graft.plans.PlanMetrics.actualRows(
      VersionedZone.lookupRange(spark, tbl, idx, "v", lit(1010L), lit(1020L)))
    val scanRows = metrics.filter(_.node.toLowerCase.contains("scan parquet"))
      .flatMap(_.outputRows).sum
    assert(scanRows <= 100L && scanRows > 0L,
      s"pruned read must stay within one partition's rows, got $scanRows")
  }

  test("a value move is visible through the zone index in the same commit") {
    val (root, tbl, idx, base) = fixture()
    // move one p0 row's value into a band far above every partition
    val delta = base.filter(col("k") === 3L).withColumn("v", lit(77777L))
    val got = VersionedZone.commitIndexed(spark, s"$root/tx2", tbl, idx, delta,
      "part", Seq("k"), "v")
    assert(got === Map(tbl -> 2L, idx -> 2L))
    // the new band immediately resolves to exactly p0 and finds the row
    assert(VersionedZone.candidatePartitions(spark, idx, lit(70000L), lit(80000L))
      === Seq("p0"))
    val hit = VersionedZone.lookupRange(spark, tbl, idx, "v", lit(70000L), lit(80000L))
      .select(col("k")).collect().map(_.getLong(0)).toSeq
    assert(hit === Seq(3L))
    // zone rows recomputed, not widened: p0's old max (v ≤ 1099 band)
    // no longer satisfies a band-top probe ABOVE the remaining rows
    val p0 = Versioned.readAsOf(spark, idx).filter(col("pval") === "p0")
      .select(col("min_v"), col("max_v"), col("rows")).collect()(0)
    assert(p0.getLong(2) === 100L, "rows carried through the recompute")
    assert(p0.getLong(1) === 77777L, "max reflects the moved value")
  }

  test("an all-NULL partition prunes conservatively and lookups stay exact") {
    val root = java.nio.file.Files.createTempDirectory("graft-vzone2").toString
    val tbl = s"$root/t"; val idx = s"$root/z"
    val rows = (0 until 60).map { i =>
      val v: java.lang.Long =
        if (i % 3 == 2) null else java.lang.Long.valueOf(100L * (i % 3) + i)
      (i.toLong, s"p${i % 3}", v)
    }.toDF("k", "part", "v")
    VersionedZone.commitIndexed(spark, s"$root/tx", tbl, idx, rows,
      "part", Seq("k"), "v")
    // p2 is all-NULL: min/max are NULL, the intersection predicate is
    // NULL, and the partition drops — correct, NULL never matches a range
    val cand = VersionedZone.candidatePartitions(spark, idx, lit(0L), lit(500L))
    assert(!cand.contains("p2"), s"all-NULL partition must prune, got $cand")
    val pruned = VersionedZone.lookupRange(spark, tbl, idx, "v", lit(0L), lit(500L))
      .collect().map(_.toString).sorted.toSeq
    val full = Versioned.readAsOf(spark, tbl)
      .filter(col("v") >= 0L && col("v") <= 500L)
      .collect().map(_.toString).sorted.toSeq
    assert(pruned === full)
  }
}
