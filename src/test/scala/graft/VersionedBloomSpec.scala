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

  test("deleteIndexed: atomic erasure, index forgets, emptied partition never a candidate") {
    val (root, tbl, idx, base) = fixture()
    // forget partition p1 ENTIRELY plus a few rows of p2: p1 must
    // vanish from manifest AND index candidacy; p2's registers tighten
    val rm = base.filter(col("part") === "p1" ||
      (col("part") === "p2" && col("k") <= 20L)).select(col("k"))
    val got = VersionedBloom.deleteIndexed(
      spark, s"$root/txf", tbl, idx, rm, Seq("k"), "ck")
    assert(got === Map(tbl -> 2L, idx -> 2L), "both tables move in lockstep")
    // lookup ≡ scan on the post-delete head, for survivors and forgotten
    val probeKeys = Seq(7L, 1042L, 2099L, 2001L)
    val pruned = VersionedBloom.lookup(spark, tbl, idx, "ck", probeKeys)
      .collect().map(_.toString).sorted.toSeq
    val full = Versioned.readAsOf(spark, tbl)
      .filter(col("ck").isin(probeKeys: _*))
      .collect().map(_.toString).sorted.toSeq
    assert(pruned === full)
    // p1 is gone from the manifest and from index candidacy: a ck that
    // lived only in p1 (1000..1099 range) finds no candidate partition
    val candP1 = VersionedBloom.candidatePartitions(spark, idx, Seq(1042L))
    assert(!candP1.contains("p1"), s"emptied partition still a candidate: $candP1")
    assert(Versioned.readAsOf(spark, tbl).filter(col("part") === "p1").count() === 0L)
    // the index row for p1 is the never-candidate form, not a stale ghost
    val p1Row = Versioned.readAsOf(spark, idx).filter(col("pval") === "p1")
      .select(col("entries")).collect()
    assert(p1Row.map(_.getLong(0)).toSeq === Seq(0L))
    // deleting nothing still mints lockstep versions (carry-forward)
    val got2 = VersionedBloom.deleteIndexed(
      spark, s"$root/txf2", tbl, idx, Seq(999999999L).toDF("k"), Seq("k"), "ck")
    assert(got2 === Map(tbl -> 3L, idx -> 3L))
    assert(Versioned.readAsOf(spark, tbl).count() ===
      Versioned.readAsOf(spark, tbl, 2L).count(), "no-op delete changed nothing")
  }

  test("commitIndexed refuses a stale base; commitIndexedRetry re-derives and lands") {
    import graft.operators.Txn
    val (root, tbl, idx, base) = fixture() // tbl and idx at v1
    // a peer holds the table's next slot (crashed after prepare): the
    // indexed commit computes its delta from v1 but reserves v3 ≠ 2 —
    // the stale-base refusal, deterministically provoked
    Txn.crashAfterPrepare(spark, s"$root/holder", Seq(
      Txn.Write(tbl, base.limit(1), "part", Seq("k"))))
    val delta = base.filter(col("k") === 5L).withColumn("ck", lit(555555L))
    intercept[Txn.TxnConflictException] {
      VersionedBloom.commitIndexed(spark, s"$root/tc", tbl, idx, delta,
        "part", Seq("k"), "ck")
    }
    assert(Versioned.latestVersion(spark, tbl) === 1L, "conflict minted nothing")
    // the janitor clears the holder; the RETRY path then lands cleanly
    assert(Txn.recover(spark, s"$root/holder") === "rolledback")
    val got = VersionedBloom.commitIndexedRetry(spark, s"$root/tr", tbl, idx,
      delta, "part", Seq("k"), "ck")
    assert(got === Map(tbl -> 2L, idx -> 2L))
    // the moved key answers through the index at its new value
    val hit = VersionedBloom.lookup(spark, tbl, idx, "ck", Seq(555555L))
      .select(col("k")).collect().map(_.getLong(0)).toSeq
    assert(hit === Seq(5L))
  }

  test("two concurrent indexed commits both land via the retry loop, index exact") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val (root, tbl, idx, base) = fixture()
    // disjoint key ranges, same table+index: whichever loses the slot
    // race conflicts and retries against the winner's head
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    def job(tag: Int): Future[Map[String, Long]] = Future {
      val delta = base.filter(col("k") % 2 === tag % 2)
        .withColumn("ck", col("ck") + lit(tag * 100000L))
      VersionedBloom.commitIndexedRetry(spark, s"$root/cc$tag", tbl, idx,
        delta, "part", Seq("k"), "ck", maxRetries = 10)
    }
    val results = Await.result(Future.sequence(Seq(job(1), job(2))), 180.seconds)
    pool.shutdown()
    assert(results.map(_(tbl)).sorted === Seq(2L, 3L), "serialized into 2 and 3")
    // numeric version EQUALITY between table and index only holds under
    // identical traffic: a conflicted attempt burns an index slot (the
    // loser reserves the index before hitting the table conflict), the
    // winner commits ACROSS the dead gap, and the retry lands higher.
    // The real invariant is per-transaction: each returned map is a
    // consistent cross-table snapshot, and the head index is exact.
    results.foreach { m =>
      assert(Versioned.retainedVersions(spark, idx).contains(m(idx)),
        s"each txn's index version ${m(idx)} is a real committed snapshot")
    }
    assert(Versioned.latestVersion(spark, idx) >= 3L)
    // index answers exactly on the post-state for keys from BOTH writers
    val full = Versioned.readAsOf(spark, tbl)
    val someCk = full.orderBy(col("ck").desc).limit(3)
      .select(col("ck")).collect().map(_.getLong(0)).toSeq
    val pruned = VersionedBloom.lookup(spark, tbl, idx, "ck", someCk)
      .collect().map(_.toString).sorted.toSeq
    val scan = full.filter(col("ck").isin(someCk: _*))
      .collect().map(_.toString).sorted.toSeq
    assert(pruned === scan && pruned.nonEmpty)
  }
}
