package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.{Txn, Versioned}

/** Cross-table 2PC: atomic commit across tables, presumed-abort
  * rollback (reservations released), and crash recovery in both
  * directions — roll FORWARD after the _COMMIT marker (fabricated
  * partial-apply state), roll BACK before it. */
class TxnSpec extends SparkSpec {

  import spark.implicits._

  private def newRoot() =
    java.nio.file.Files.createTempDirectory("graft-txn").toString

  private def ledger(n: Int, bump: Long = 0L) =
    (1 to n).map(i => (i.toLong, s"p${i % 3}", i * 10L + bump))
      .toDF("k", "part", "amount")

  private def summaryOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("part")).agg(count(lit(1)).as("n"), sum(col("amount")).as("total"))

  test("a committed transaction moves every table together") {
    val root = newRoot()
    val a = s"$root/ledger"; val b = s"$root/summary"
    val base = ledger(30)
    val got = Txn.run(spark, s"$root/txn1", Seq(
      Txn.Write(a, base, "part", Seq("k")),
      Txn.Write(b, summaryOf(base), "part", Seq("part"))))
    assert(got === Map(a -> 1L, b -> 1L))
    assert(Versioned.latestVersion(spark, a) === 1L)
    assert(Versioned.latestVersion(spark, b) === 1L)
    // summary table IS the aggregate of the ledger table
    val fromA = summaryOf(Versioned.readAsOf(spark, a))
      .collect().map(_.toString).sorted.toSeq
    val fromB = Versioned.readAsOf(spark, b)
      .select(col("part"), col("n"), col("total"))
      .collect().map(_.toString).sorted.toSeq
    assert(fromA === fromB)
    assert(Txn.versions(spark, s"$root/txn1") === got)
    assert(Txn.recover(spark, s"$root/txn1") === "noop")
  }

  test("prepare failure rolls back: nothing visible, reservations released") {
    val root = newRoot()
    val a = s"$root/ledger"; val b = s"$root/summary"
    val base = ledger(30)
    Txn.run(spark, s"$root/t1", Seq(
      Txn.Write(a, base, "part", Seq("k")),
      Txn.Write(b, summaryOf(base), "part", Seq("part"))))
    // second txn dies during prepare: the B delta throws on materialize
    val poison = summaryOf(base)
      .withColumn("n", expr("assert_true(n < 0)").cast("long"))
    intercept[Throwable] {
      Txn.run(spark, s"$root/t2", Seq(
        Txn.Write(a, ledger(30, bump = 5L), "part", Seq("k")),
        Txn.Write(b, poison, "part", Seq("part"))))
    }
    assert(Versioned.latestVersion(spark, a) === 1L, "aborted txn minted no version")
    assert(Versioned.latestVersion(spark, b) === 1L)
    // reservations were released: a CAS commit proceeds without stalling
    val v = Versioned.commitCas(spark, a, ledger(5, bump = 1L), "part", Seq("k"),
      waitMs = 2000L)
    assert(v === 2L)
    // prepare failure already rolled t2 back (its _ABORTED marker is
    // durable), so a later recover is a no-op, not a second rollback
    assert(Txn.recover(spark, s"$root/t2") === "noop")
  }

  test("a delta with NULL or empty-string partition values is refused at prepare") {
    val root = newRoot()
    val a = s"$root/ledger"
    Txn.run(spark, s"$root/t1", Seq(Txn.Write(a, ledger(10), "part", Seq("k"))))
    // NULL pval: collect_set drops it, so the affected hint would
    // silently omit the partition — prepare must bounce instead
    val nullPart = Seq((100L, null.asInstanceOf[String], 1L),
      (101L, "p1", 2L)).toDF("k", "part", "amount")
    val e1 = intercept[IllegalArgumentException] {
      Txn.run(spark, s"$root/t2", Seq(Txn.Write(a, nullPart, "part", Seq("k"))))
    }
    assert(e1.getMessage.contains("NULL or empty-string"))
    // empty-string pval: unrepresentable in the comma-joined encoding
    // (conflates empty set with {''}) — same refusal
    val emptyPart = Seq((102L, "", 3L)).toDF("k", "part", "amount")
    val e2 = intercept[IllegalArgumentException] {
      Txn.run(spark, s"$root/t3", Seq(Txn.Write(a, emptyPart, "part", Seq("k"))))
    }
    assert(e2.getMessage.contains("NULL or empty-string"))
    // both refusals are presumed-abort: no version minted, slots released
    assert(Versioned.latestVersion(spark, a) === 1L)
    val v = Versioned.commitCas(spark, a, ledger(5, bump = 2L), "part", Seq("k"),
      waitMs = 2000L)
    assert(v === 2L)
  }

  test("crash after _COMMIT with one table applied: recover rolls forward") {
    val root = newRoot()
    val a = s"$root/ledger"; val b = s"$root/summary"
    val base = ledger(30)
    Txn.run(spark, s"$root/t1", Seq(
      Txn.Write(a, base, "part", Seq("k")),
      Txn.Write(b, summaryOf(base), "part", Seq("part"))))
    // fabricate the crash state of txn2 (documented coordinator-log
    // format): deltas staged, intents recorded, _COMMIT present, table
    // A applied at its reserved version, table B not
    val dir = s"$root/t2"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val deltaA = ledger(30, bump = 7L)
    val deltaB = summaryOf(deltaA)
    deltaA.write.parquet(s"$dir/delta-0")
    deltaB.write.parquet(s"$dir/delta-1")
    def intent(i: Int, table: String, partCol: String, keys: String, v: Long, dp: String): Unit = {
      val out = fs.create(new Path(dir, s"intent-$i"), false)
      out.write(s"table=$table\nversion=$v\npartCol=$partCol\nkeys=$keys\ndelta=$dp\n"
        .getBytes("UTF-8"))
      out.close()
    }
    intent(0, a, "part", "k", 2L, s"$dir/delta-0")
    intent(1, b, "part", "part", 2L, s"$dir/delta-1")
    fs.create(new Path(dir, "_COMMIT"), false).close()
    Versioned.commit(spark, a, deltaA, "part", Seq("k")) // A landed pre-crash
    assert(Versioned.latestVersion(spark, a) === 2L)
    assert(Versioned.latestVersion(spark, b) === 1L, "the drift window")

    assert(Txn.recover(spark, dir) === "forward")
    assert(Versioned.latestVersion(spark, a) === 2L, "A not double-committed")
    assert(Versioned.latestVersion(spark, b) === 2L, "B finished by recover")
    val fromA = summaryOf(Versioned.readAsOf(spark, a))
      .collect().map(_.toString).sorted.toSeq
    val fromB = Versioned.readAsOf(spark, b)
      .select(col("part"), col("n"), col("total"))
      .collect().map(_.toString).sorted.toSeq
    assert(fromA === fromB, "tables consistent after roll-forward")
    assert(Txn.recover(spark, dir) === "noop")
  }

  test("two concurrent transactions over the same tables serialize") {
    val root = newRoot()
    val a = s"$root/ledger"; val b = s"$root/mirror"
    val base = ledger(10)
    Txn.run(spark, s"$root/t0", Seq(
      Txn.Write(a, base, "part", Seq("k")),
      Txn.Write(b, base, "part", Seq("k"))))
    // each concurrent txn upserts a disjoint key range into BOTH tables
    def job(tag: Int): Thread = {
      val t = new Thread(() => {
        val rows = (100 * tag to 100 * tag + 9)
          .map(i => (i.toLong, s"p${i % 3}", i.toLong)).toDF("k", "part", "amount")
        Txn.run(spark, s"$root/tc$tag", Seq(
          Txn.Write(a, rows, "part", Seq("k")),
          Txn.Write(b, rows, "part", Seq("k"))))
        ()
      })
      t.start(); t
    }
    val threads = Seq(job(1), job(2))
    threads.foreach(_.join(120000))
    assert(Versioned.latestVersion(spark, a) === 3L, "2 txns serialized after v1")
    assert(Versioned.latestVersion(spark, b) === 3L)
    val inA = Versioned.readAsOf(spark, a).collect().map(_.toString).sorted.toSeq
    val inB = Versioned.readAsOf(spark, b).collect().map(_.toString).sorted.toSeq
    assert(inA === inB, "both tables saw both transactions")
    assert(inA.length === 30, "base 10 + two disjoint 10-row upserts")
  }

  test("optimistic conflict check: a stale-snapshot write aborts the txn") {
    val root = newRoot()
    val a = s"$root/ledger"
    Versioned.commit(spark, a, ledger(10), "part", Seq("k"))
    // both writers derive their deltas from v1
    Txn.run(spark, s"$root/w1", Seq(
      Txn.Write(a, ledger(10, bump = 1L), "part", Seq("k"), expectedVersion = Some(1L))))
    assert(Versioned.latestVersion(spark, a) === 2L)
    // the second writer's snapshot is stale -> conflict, nothing lands
    val e = intercept[graft.operators.Txn.TxnConflictException] {
      Txn.run(spark, s"$root/w2", Seq(
        Txn.Write(a, ledger(10, bump = 2L), "part", Seq("k"), expectedVersion = Some(1L))))
    }
    assert(e.getMessage.contains("write-write conflict"))
    assert(Versioned.latestVersion(spark, a) === 2L, "conflicted txn minted nothing")
    // retry from the CURRENT snapshot succeeds
    Txn.run(spark, s"$root/w3", Seq(
      Txn.Write(a, ledger(10, bump = 2L), "part", Seq("k"), expectedVersion = Some(2L))))
    assert(Versioned.latestVersion(spark, a) === 3L)
  }

  test("a released slot below a committed txn does not wedge apply (gap skip)") {
    val root = newRoot()
    val a = s"$root/ledger"
    Versioned.commit(spark, a, ledger(10), "part", Seq("k"))
    // txn LOW crashes after prepare: slot v=2 locked, no _COMMIT
    Txn.crashAfterPrepare(spark, s"$root/low", Seq(
      Txn.Write(a, ledger(10, bump = 9L), "part", Seq("k"))))
    // txn HIGH reserves v=3, writes its _COMMIT, then blocks in apply
    // waiting for the (live) v=2 slot
    val deltaHigh = ledger(5, bump = 4L)
    @volatile var highResult: Option[Map[String, Long]] = None
    val high = new Thread(() => {
      highResult = Some(Txn.run(spark, s"$root/high", Seq(
        Txn.Write(a, deltaHigh, "part", Seq("k")))))
    })
    high.start()
    // wait until HIGH is past its decision point (outcome now fixed:
    // commit — the guarantee the gap must not be able to void)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deadline = System.currentTimeMillis() + 60000
    while (!fs.exists(new Path(s"$root/high", "_COMMIT"))
        && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(fs.exists(new Path(s"$root/high", "_COMMIT")))
    // the janitor rolls LOW back — v=2 released; HIGH's own v=3
    // reservation makes the slot unreachable forever (reserveVersion
    // picks above maxReserved), so HIGH must commit ACROSS the gap
    assert(Txn.recover(spark, s"$root/low") === "rolledback")
    high.join(60000)
    assert(highResult === Some(Map(a -> 3L)), "HIGH applied at its reserved slot")
    assert(Versioned.latestVersion(spark, a) === 3L)
    // v=3 carries v=1 forward as prior: merge(v1, deltaHigh), no v=2
    val got = Versioned.readAsOf(spark, a)
      .select(col("k"), col("amount")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (1 to 10).map(i => i.toLong -> i * 10L).toMap ++
      (1 to 5).map(i => i.toLong -> (i * 10L + 4L)).toMap
    assert(got === want, "content is merge(v1, HIGH's delta) — LOW never landed")
  }

  test("recoverAll sweeps a root: crashed coordinators found without handles") {
    val root = newRoot()
    val a = s"$root/ledger"; val b = s"$root/summary"
    val base = ledger(20)
    // one COMPLETED transaction through the managed path (dir allocated
    // by the library — the caller never learns it)
    val got = Txn.runManaged(spark, s"$root/txns", Seq(
      Txn.Write(a, base, "part", Seq("k")),
      Txn.Write(b, summaryOf(base), "part", Seq("part"))))
    assert(got === Map(a -> 1L, b -> 1L))
    // one CRASHED-after-prepare coordinator under the same root: slots
    // locked on both tables, nothing visible
    Txn.crashAfterPrepare(spark, s"$root/txns/txn-dead", Seq(
      Txn.Write(a, ledger(20, bump = 3L), "part", Seq("k")),
      Txn.Write(b, summaryOf(ledger(20, bump = 3L)), "part", Seq("part"))))
    // a BYSTANDER directory under the same root (a table, a feed, a
    // checkpoint someone parked there) must be skipped, never rolled back
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$root/txns/not-a-txn"))
    val out = fs.create(new Path(s"$root/txns/not-a-txn/data.txt"), false)
    out.write("precious".getBytes("UTF-8")); out.close()
    val swept = Txn.recoverAll(spark, s"$root/txns")
    assert(swept.size === 3)
    assert(swept.values.toSeq.sorted === Seq("noop", "rolledback", "skipped"))
    assert(fs.exists(new Path(s"$root/txns/not-a-txn/data.txt")),
      "janitor must not touch non-coordinator directories")
    assert(Versioned.latestVersion(spark, a) === 1L, "crashed txn minted nothing")
    assert(Versioned.latestVersion(spark, b) === 1L)
    // the released slots are actually usable again: a plain CAS commit
    // proceeds without stalling on a stale reservation
    assert(Versioned.commitCas(spark, a, ledger(3, bump = 1L), "part", Seq("k"),
      waitMs = 2000L) === 2L)
    // a second sweep is all-noop/skipped (idempotent janitor)
    assert(Txn.recoverAll(spark, s"$root/txns")
      .valuesIterator.forall(o => o == "noop" || o == "skipped"))
  }

  test("a delete that would empty a table is refused at PREPARE, never post-commit") {
    val root = newRoot()
    val a = s"$root/ledger"
    Versioned.commit(spark, a, ledger(10), "part", Seq("k"))
    val e = intercept[IllegalArgumentException] {
      Txn.run(spark, s"$root/td", Seq(
        Txn.Write(a, ledger(10).select(col("k")), "", Seq("k"), op = "delete")))
    }
    assert(e.getMessage.contains("refused at prepare"))
    assert(Versioned.latestVersion(spark, a) === 1L, "nothing minted")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$root/td", "_COMMIT")),
      "the refusal fired before the decision point")
    // the table is NOT wedged: the released slot takes the next commit
    assert(Versioned.commitCas(spark, a, ledger(3, bump = 2L), "part", Seq("k"),
      waitMs = 2000L) === 2L)
    // a partial delete through the same op still works
    val got = Txn.run(spark, s"$root/tp", Seq(
      Txn.Write(a, ledger(4).select(col("k")), "", Seq("k"), op = "delete")))
    assert(got === Map(a -> 3L))
    assert(Versioned.readAsOf(spark, a).filter(col("k") <= 4L).count() === 0L)
  }

  test("a COMMITTED delete raced into emptying the table still completes (empty-state mint)") {
    val root = newRoot()
    val a = s"$root/ledger"
    Versioned.commit(spark, a, ledger(10), "part", Seq("k"))
    // two deletes whose union is the whole table, both past PREPARE
    // against head v1 (each sees survivors, so both refusals pass),
    // then both cross their _COMMIT decision point — the race the
    // prepare-time check cannot see
    Txn.crashAfterPrepare(spark, s"$root/lowDel", Seq(
      Txn.Write(a, ledger(5).select(col("k")), "", Seq("k"), op = "delete")))
    Txn.crashAfterPrepare(spark, s"$root/highDel", Seq(
      Txn.Write(a, ledger(10).filter(col("k") > 5L).select(col("k")), "",
        Seq("k"), op = "delete")))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("lowDel", "highDel").foreach { d =>
      val out = fs.create(new Path(s"$root/$d", "_COMMIT"), false); out.close()
    }
    assert(Txn.recover(spark, s"$root/lowDel") === "forward")
    assert(Versioned.readAsOf(spark, a).count() === 5L)
    // the high delete now erases the LAST survivors — after _COMMIT the
    // outcome is commit, so it must complete (explicit empty version),
    // not throw forever out of every recover()
    assert(Txn.recover(spark, s"$root/highDel") === "forward")
    assert(Versioned.latestVersion(spark, a) === 3L)
    val empty = Versioned.readAsOf(spark, a)
    assert(empty.count() === 0L, "v3 is the explicit empty-table state")
    assert(empty.columns.sorted.toSeq === Seq("amount", "k", "part"),
      "empty version keeps the schema (borrowed from ref-bearing history)")
    assert(Txn.recover(spark, s"$root/highDel") === "noop", "re-recover settles")
    // history is intact and the table takes new commits
    assert(Versioned.readAsOf(spark, a, 1L).count() === 10L)
    assert(Versioned.commit(spark, a, ledger(3, bump = 7L), "part", Seq("k")) === 4L)
    assert(Versioned.readAsOf(spark, a).count() === 3L)
  }

  test("recoverAll liveness lease: a fresh (possibly live) coordinator is not rolled back") {
    val root = newRoot()
    val a = s"$root/ledger"
    Versioned.commit(spark, a, ledger(10), "part", Seq("k"))
    Txn.crashAfterPrepare(spark, s"$root/txns/txn-fresh", Seq(
      Txn.Write(a, ledger(10, bump = 1L), "part", Seq("k"))))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // under a lease, the just-prepared coordinator reads as LIVE: a
    // peer may be between prepare and _COMMIT — destroying its staged
    // state would break the peer mid-transaction
    val guarded = Txn.recoverAll(spark, s"$root/txns", liveLeaseMs = 600000L)
    assert(guarded.valuesIterator.toSeq === Seq("live"))
    assert(fs.exists(new Path(s"$root/txns/txn-fresh", "intent-0")),
      "lease-guarded coordinator untouched")
    // lease 0 = restart semantics (no peer can be live): swept normally
    val swept = Txn.recoverAll(spark, s"$root/txns")
    assert(swept.valuesIterator.toSeq === Seq("rolledback"))
    assert(Versioned.latestVersion(spark, a) === 1L)
  }

  test("sweep cost is bounded by in-flight coordinators, not completed-txn history") {
    val root = newRoot()
    val a = s"$root/ledger"
    (1 to 4).foreach { i =>
      Txn.runManaged(spark, s"$root/txns", Seq(
        Txn.Write(a, ledger(5, bump = i.toLong), "part", Seq("k"))))
    }
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // first sweep reaps the 4 completed coordinators into _done
    val first = Txn.recoverAll(spark, s"$root/txns")
    assert(first.size === 4 && first.valuesIterator.forall(_ == "noop"))
    // a later sweep no longer lists them at all: the root holds only
    // the _done bucket (one listing entry forever) + in-flight dirs
    assert(Txn.recoverAll(spark, s"$root/txns") === Map.empty)
    val listed = fs.listStatus(new Path(s"$root/txns")).map(_.getPath.getName).toSet
    assert(listed === Set("_done"), s"root holds only the _done bucket, got $listed")
    // one new in-flight crash is the ONLY thing the next sweep touches
    Txn.crashAfterPrepare(spark, s"$root/txns/txn-live", Seq(
      Txn.Write(a, ledger(5, bump = 9L), "part", Seq("k"))))
    val next = Txn.recoverAll(spark, s"$root/txns")
    assert(next.size === 1 && next.valuesIterator.toSeq === Seq("rolledback"))
    // recover() on a reaped path settles as noop (callers re-driving
    // an old handle after the janitor moved it)
    assert(Txn.recover(spark, first.keys.head) === "noop")
  }

  test("recover before _COMMIT rolls back a prepared-but-undecided txn") {
    val root = newRoot()
    val a = s"$root/ledger"
    Versioned.commit(spark, a, ledger(10), "part", Seq("k"))
    val dir = s"$root/tx"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    ledger(10, bump = 3L).write.parquet(s"$dir/delta-0")
    val out = fs.create(new Path(dir, "intent-0"), false)
    out.write(s"table=$a\nversion=2\npartCol=part\nkeys=k\ndelta=$dir/delta-0\n"
      .getBytes("UTF-8"))
    out.close()
    assert(Txn.recover(spark, dir) === "rolledback")
    assert(Versioned.latestVersion(spark, a) === 1L)
    assert(fs.exists(new Path(dir, "_ABORTED")))
  }
}
