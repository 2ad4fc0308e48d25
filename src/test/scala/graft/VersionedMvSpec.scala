package graft

import org.apache.spark.sql.functions._
import graft.operators.{Versioned, VersionedMv}

/** Transactionally-maintained materialized aggregate: view reads equal
  * recomputed aggregates under pure-update churn (the retraction case),
  * versions move in lockstep, the view read scans k rows, and
  * impossible states (negative counts from delete-shaped misuse) fail
  * loudly instead of shipping. */
class VersionedMvSpec extends SparkSpec {

  import spark.implicits._

  private def fixture() = {
    val root = java.nio.file.Files.createTempDirectory("graft-vmv").toString
    val tbl = s"$root/t"; val mv = s"$root/mv"
    val base = (0 until 300).map { i =>
      (i.toLong, s"p${i % 4}", s"g${i % 3}",
        java.math.BigDecimal.valueOf((i * 7 % 100) + 1).setScale(2))
    }.toDF("k", "part", "g", "v")
    VersionedMv.commitWithMv(spark, s"$root/tx1", tbl, mv, base,
      "part", Seq("k"), Seq("g"), "v")
    (root, tbl, mv, base)
  }

  private def recompute(tbl: String) =
    Versioned.readAsOf(spark, tbl).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("decimal(30,2)").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).sortBy(_._1).toSeq

  private def view(mv: String) =
    VersionedMv.read(spark, mv, Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).sortBy(_._1).toSeq

  test("view equals recomputed aggregate after build and after update churn") {
    val (root, tbl, mv, base) = fixture()
    assert(view(mv) === recompute(tbl))
    // pure update: same keys, same groups, shifted values — add-only
    // IVM double-counts here; retraction must land the exact new sums
    val delta = base.filter(col("k") % 7 === 0)
      .withColumn("v", (col("v") + lit(1000)).cast("decimal(12,2)"))
    VersionedMv.commitWithMv(spark, s"$root/tx2", tbl, mv, delta,
      "part", Seq("k"), Seq("g"), "v")
    assert(view(mv) === recompute(tbl))
    assert(Versioned.latestVersion(spark, tbl) === 2L)
    assert(Versioned.latestVersion(spark, mv) === 2L)
  }

  test("a key moving BETWEEN groups retracts from the old group") {
    val (root, tbl, mv, base) = fixture()
    val delta = base.filter(col("k") < 10L).withColumn("g", lit("g9"))
    VersionedMv.commitWithMv(spark, s"$root/tx2", tbl, mv, delta,
      "part", Seq("k"), Seq("g"), "v")
    val v = view(mv).map { case (g, n, _) => g -> n }.toMap
    assert(v("g9") === 10L, s"moved keys must land in the new group: $v")
    assert(view(mv) === recompute(tbl))
  }

  test("new groups appear; untouched groups keep their rows") {
    val (root, tbl, mv, _) = fixture()
    val delta = Seq((1000L, "p0", "brand_new",
      java.math.BigDecimal.valueOf(5).setScale(2))).toDF("k", "part", "g", "v")
    VersionedMv.commitWithMv(spark, s"$root/tx2", tbl, mv, delta,
      "part", Seq("k"), Seq("g"), "v")
    assert(view(mv) === recompute(tbl))
    assert(view(mv).exists(_._1 == "brand_new"))
  }

  test("a group FULLY evacuated by churn vanishes from the view") {
    val (root, tbl, mv, base) = fixture()
    // move EVERY g2 key to g0: the MV table keeps a (g2, 0, 0.00) row
    // (the incremental delta cannot delete), but the view contract is
    // reads ≡ recomputed aggregates — and a recomputed GROUP BY has no
    // empty groups, so read() must filter the zero-count row out
    val delta = base.filter(col("g") === "g2").withColumn("g", lit("g0"))
    VersionedMv.commitWithMv(spark, s"$root/tx2", tbl, mv, delta,
      "part", Seq("k"), Seq("g"), "v")
    assert(!view(mv).exists(_._1 == "g2"),
      "fully-evacuated group must not read back as a phantom row")
    assert(view(mv) === recompute(tbl))
  }

  test("compact sweeps the evacuated group's zero row physically") {
    val (root, tbl, mv, base) = fixture()
    val delta = base.filter(col("g") === "g2").withColumn("g", lit("g0"))
    VersionedMv.commitWithMv(spark, s"$root/tx2", tbl, mv, delta,
      "part", Seq("k"), Seq("g"), "v")
    // before the sweep the dead row is physically present (read-filtered)
    val rawBefore = Versioned.readAsOf(spark, mv)
      .filter(col("n") === 0).count()
    assert(rawBefore === 1L, "evacuation must leave exactly one zero row")
    val viewBefore = view(mv)
    val committed = VersionedMv.compact(spark, s"$root/tx-sweep", mv, Seq("g"))
    assert(committed.contains(mv), "the sweep must commit a new MV version")
    // physically gone: the RAW table (no read filter) has no zero row
    assert(Versioned.readAsOf(spark, mv).filter(col("n") === 0).isEmpty,
      "zero row must be physically swept, not just read-filtered")
    // and reads are unchanged, still equal to recomputation
    assert(view(mv) === viewBefore)
    assert(view(mv) === recompute(tbl))
    // idempotent: a second compact on the clean view commits nothing new
    assert(VersionedMv.compact(spark, s"$root/tx-sweep2", mv, Seq("g")).isEmpty)
  }

  test("the view read scans exactly the group rows, never the base") {
    val (_, _, mv, _) = fixture()
    val df = VersionedMv.read(spark, mv, Seq("g"))
    val scanRows = graft.plans.PlanMetrics.actualRows(df)
      .filter(_.node.toLowerCase.contains("scan parquet"))
      .flatMap(_.outputRows).sum
    assert(scanRows === 3L, s"expected 3 group rows scanned, got $scanRows")
  }

  test("a stale-base retraction is refused, not raced") {
    val (root, tbl, mv, base) = fixture()
    val delta = base.filter(col("k") === 1L)
      .withColumn("v", lit(java.math.BigDecimal.valueOf(9).setScale(2)))
    // pin the MV delta against version 1, then move the base under it
    val stale = VersionedMv.mvDelta(spark, tbl, mv, delta,
      Seq("k"), Seq("g"), "v", asOfVersion = 1L)
    VersionedMv.commitWithMv(spark, s"$root/tx2", tbl, mv,
      base.filter(col("k") === 2L)
        .withColumn("v", lit(java.math.BigDecimal.valueOf(8).setScale(2))),
      "part", Seq("k"), Seq("g"), "v")
    intercept[graft.operators.Txn.TxnConflictException] {
      graft.operators.Txn.run(spark, s"$root/tx-stale", Seq(
        graft.operators.Txn.Write(tbl, delta, "part", Seq("k"),
          expectedVersion = Some(1L)),
        graft.operators.Txn.Write(mv, stale, "g", Seq("g"))))
    }
  }
}
