package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.Versioned

/** Versioned snapshot table: commits, time travel, file reuse across
  * versions, crash invisibility of uncommitted generations, retention. */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshTbl() =
    Files.createTempDirectory("graft-versioned").toString + "/t"

  private def rows(t: Seq[(Long, String, Double)]) =
    t.toDF("id", "part", "value")

  test("each commit is a readable version and history stays intact") {
    val tbl = freshTbl()
    val v1 = Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))),
      "part", Seq("id"))
    assert(v1 === 1)
    val v2 = Versioned.commit(spark, tbl, rows(Seq((2L, "a", 20.0), (4L, "a", 4.0))),
      "part", Seq("id"))
    assert(v2 === 2)
    assert(Versioned.latestVersion(spark, tbl) === 2)

    val asOf1 = Versioned.readAsOf(spark, tbl, 1).as[(Long, String, Double)].collect().toSet
    assert(asOf1 === Set((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)))
    val asOf2 = Versioned.readAsOf(spark, tbl, 2).as[(Long, String, Double)].collect().toSet
    assert(asOf2 === Set((1L, "a", 1.0), (2L, "a", 20.0), (3L, "b", 3.0), (4L, "a", 4.0)))
    // default read = latest
    assert(Versioned.readAsOf(spark, tbl).count() === 4)
  }

  test("commits rewrite only affected partitions; untouched ones share files") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0), (3L, "b", 3.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((2L, "a", 2.0))), "part", Seq("id"))
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // generation 2 holds ONLY partition a — b was carried forward
    assert(fs.exists(new Path(s"$tbl/gen/__gen=2/__p=a")))
    assert(!fs.exists(new Path(s"$tbl/gen/__gen=2/__p=b")))
    // and version 2 still serves b from generation 1 (same files)
    val asOf2 = Versioned.readAsOf(spark, tbl, 2).as[(Long, String, Double)].collect().toSet
    assert(asOf2 === Set((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)))
  }

  test("a generation without its manifest commit is invisible and retry heals it") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0))), "part", Seq("id"))
    // simulate a crash: generation 2's data landed, manifest never committed
    rows(Seq((9L, "a", 9.0))).withColumn("__p", col("part").cast("string"))
      .write.mode("overwrite").partitionBy("__p").parquet(s"$tbl/gen/__gen=2")
    assert(Versioned.latestVersion(spark, tbl) === 1)
    assert(Versioned.readAsOf(spark, tbl).count() === 1)
    // the retried commit overwrites the orphan generation in place
    Versioned.commit(spark, tbl, rows(Seq((2L, "a", 2.0))), "part", Seq("id"))
    val latest = Versioned.readAsOf(spark, tbl).as[(Long, String, Double)].collect().toSet
    assert(latest === Set((1L, "a", 1.0), (2L, "a", 2.0)))
  }

  test("a manifest without _SUCCESS does not count as committed") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0))), "part", Seq("id"))
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$tbl/manifest/v=2")) // crash mid manifest write
    assert(Versioned.latestVersion(spark, tbl) === 1)
  }

  test("expire keeps the retained versions readable and reclaims the rest") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0), (3L, "b", 3.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 10.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 100.0))), "part", Seq("id"))
    Versioned.expire(spark, tbl, keep = 2)
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // v1's manifest is gone; generation 1's partition b survives because
    // versions 2 and 3 still reference it, but a@gen1 is reclaimed
    assert(!fs.exists(new Path(s"$tbl/manifest/v=1")))
    assert(fs.exists(new Path(s"$tbl/gen/__gen=1/__p=b")))
    assert(!fs.exists(new Path(s"$tbl/gen/__gen=1/__p=a")))
    val asOf2 = Versioned.readAsOf(spark, tbl, 2).as[(Long, String, Double)].collect().toSet
    assert(asOf2 === Set((1L, "a", 10.0), (3L, "b", 3.0)))
    val asOf3 = Versioned.readAsOf(spark, tbl, 3).as[(Long, String, Double)].collect().toSet
    assert(asOf3 === Set((1L, "a", 100.0), (3L, "b", 3.0)))
    intercept[Exception](Versioned.readAsOf(spark, tbl, 1).collect())
  }

  test("fsck detects a missing referenced generation and an orphan directory") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0), (2L, "b", 2.0))),
      "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 10.0))), "part", Seq("id"))
    assert(Versioned.fsck(spark, tbl) === ((2L, 3L, 0L, 0L)),
      "healthy store: 2 versions, gen1 a+b plus gen2 a, no missing/orphans")
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    // corrupt: delete a referenced generation dir
    assert(fs.delete(new Path(s"$tbl/gen/__gen=1/__p=b"), true))
    // plant: a directory no manifest references
    fs.mkdirs(new Path(s"$tbl/gen/__gen=9/__p=zzz"))
    val (vs, refs, missing, orphans) = Versioned.fsck(spark, tbl)
    assert(vs === 2L && refs === 3L)
    assert(missing === 1L, "deleted referenced dir must be reported missing")
    assert(orphans === 1L, "unreferenced dir must be reported orphan")
  }

  test("stamped commits resolve AS OF reads; unstamped commits don't participate") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0))), "part", Seq("id"),
      stamp = Some(100L))
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 2.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 3.0))), "part", Seq("id"),
      stamp = Some(300L))
    assert(Versioned.stampOf(spark, tbl, 1) === Some(100L))
    assert(Versioned.stampOf(spark, tbl, 2) === None)
    assert(Versioned.stampOf(spark, tbl, 3) === Some(300L))
    // between stamps: newest stamped version <= s (the unstamped v2 is
    // invisible to stamp resolution even though it's newer than v1)
    assert(Versioned.readAsOfStamp(spark, tbl, 250L)
      .as[(Long, String, Double)].collect().toSet === Set((1L, "a", 1.0)))
    assert(Versioned.readAsOfStamp(spark, tbl, 300L)
      .as[(Long, String, Double)].collect().toSet === Set((1L, "a", 3.0)))
    intercept[IllegalArgumentException](Versioned.readAsOfStamp(spark, tbl, 99L))
  }

  test("shallow clone copies no data, reads the cloned state, and evolves independently") {
    val root = Files.createTempDirectory("graft-clone").toString
    val src = s"$root/src"
    val dst = s"$root/clone"
    Versioned.commit(spark, src, rows(Seq((1L, "a", 1.0), (3L, "b", 3.0))), "part", Seq("id"))
    Versioned.commit(spark, src, rows(Seq((2L, "a", 2.0))), "part", Seq("id"))

    val v0 = Versioned.shallowClone(spark, src, dst)
    assert(v0 === 2, "clone's first version = max cloned generation")
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$dst/gen")), "zero-copy: clone holds no data dirs")
    assert(Versioned.readAsOf(spark, dst).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)))
    assert(Versioned.fsck(spark, dst) === ((1L, 2L, 0L, 0L)),
      "source-served refs are not 'missing'")

    // clone commit localizes ONLY the touched partition (copy-on-write)
    Versioned.commit(spark, dst, rows(Seq((1L, "a", 10.0))), "part", Seq("id"))
    assert(fs.exists(new Path(s"$dst/gen/__gen=3/__p=a")))
    assert(!fs.exists(new Path(s"$dst/gen/__gen=3/__p=b")), "untouched partition stays shared")
    // source commit after the clone: neither side sees the other's delta
    Versioned.commit(spark, src, rows(Seq((3L, "b", 30.0))), "part", Seq("id"))
    assert(Versioned.readAsOf(spark, dst).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 10.0), (2L, "a", 2.0), (3L, "b", 3.0)))
    assert(Versioned.readAsOf(spark, src).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 30.0)))
    // and the clone's base version still reads the clone-time state
    assert(Versioned.readAsOf(spark, dst, v0).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)))
  }

  test("expire on a cloned source pins every generation the clone references") {
    val tbl = freshTbl()
    // three versions touching partition a — only gen 3 would survive
    // expire(keep=1) without the clone pin
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0), (3L, "b", 3.0))), "part", Seq("id"))
    val cloneAt = Versioned.commit(spark, tbl, rows(Seq((2L, "a", 2.0))), "part", Seq("id"))
    val clone = freshTbl()
    Versioned.shallowClone(spark, tbl, clone, cloneAt)
    val cloneState = Versioned.readAsOf(spark, clone)
      .as[(Long, String, Double)].collect().toSet
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 10.0))), "part", Seq("id"))

    Versioned.expire(spark, tbl, keep = 1)
    // the clone still reads its exact snapshot: gens 1 (b) and 2 (a)
    // were pinned even though no retained SOURCE manifest references
    // gen 2's partition a
    assert(Versioned.readAsOf(spark, clone)
      .as[(Long, String, Double)].collect().toSet === cloneState)
    val (_, _, missing, _) = Versioned.fsck(spark, clone)
    assert(missing === 0L, "clone must fsck green after source-side expire")

    // materialize → full independence → pin released → expire reclaims
    Versioned.materialize(spark, clone)
    Versioned.expire(spark, clone, keep = 1) // drop the still-shared clone v2
    Versioned.expire(spark, tbl, keep = 1)
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$tbl/gen/__gen=2/__p=a")),
      "released pin must let the source reclaim the clone's old generation")
    // and the clone still reads its snapshot from its OWN files
    assert(Versioned.readAsOf(spark, clone)
      .as[(Long, String, Double)].collect().toSet === cloneState)
  }

  test("snapshot export/import round-trips a historical version and rejects a tampered bundle") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl,
      rows(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((2L, "a", 20.0), (4L, "c", 4.0))), "part", Seq("id"))
    val root = Files.createTempDirectory("graft-export").toString
    val bundle = s"$root/bundle"

    // export the HISTORICAL v1 (not head) and re-import elsewhere
    val (v, total) = Versioned.exportSnapshot(spark, tbl, bundle, version = 1L)
    assert(v === 1L && total === 3L)
    val imp = freshTbl()
    assert(Versioned.importSnapshot(spark, bundle, imp) === 1L)
    assert(Versioned.readAsOf(spark, imp).as[(Long, String, Double)].collect().toSet ===
      Versioned.readAsOf(spark, tbl, 1L).as[(Long, String, Double)].collect().toSet)
    // the imported table versions forward independently
    Versioned.commit(spark, imp, rows(Seq((5L, "b", 5.0))), "part", Seq("id"))
    assert(Versioned.readAsOf(spark, imp).count() === 4L)
    val (_, _, missing, _) = Versioned.fsck(spark, imp)
    assert(missing === 0L)

    // tamper: drop a data file from one partition — import must refuse
    // loudly, naming the partition, and leave the target a non-table
    val fs = new Path(bundle).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aDir = new Path(s"$bundle/data/__p=a")
    val dataFile = fs.listStatus(aDir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    fs.delete(dataFile, false)
    val imp2 = freshTbl()
    val ex = intercept[IllegalArgumentException](
      Versioned.importSnapshot(spark, bundle, imp2))
    assert(ex.getMessage.contains("failed verification") &&
      ex.getMessage.endsWith("a"), ex.getMessage)
    assert(Versioned.latestVersion(spark, imp2) === 0L)
  }

  test("a deleted clone's registration is reaped and stops pinning") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((2L, "a", 2.0))), "part", Seq("id"))
    val clone = freshTbl()
    Versioned.shallowClone(spark, tbl, clone)
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 10.0))), "part", Seq("id"))
    // drop the clone from disk entirely — the registration goes stale
    val fs = new Path(clone).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(clone), true)
    Versioned.expire(spark, tbl, keep = 1)
    assert(!fs.exists(new Path(s"$tbl/gen/__gen=2/__p=a")),
      "a deleted clone must not pin source retention")
  }

  test("scrub-crash residue between scrub and expire survives expire and heals on the next scrub") {
    import graft.operators.Forget
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0), (2L, "b", 2.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((3L, "a", 3.0))), "part", Seq("id"))
    Forget.scrubVersioned(spark, tbl, Seq(2L).toDF("id"), Seq("id"))

    // inject the mid-swap crash window on a LIVE dir, exactly between
    // stagedRewrite's two renames: __new complete (with _SUCCESS from
    // the staged write), __old holding the pre-rewrite copy, the live
    // dir GONE — the state the governance pipeline can be in when
    // retention runs next
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tbl).getFileSystem(hconf)
    val dir = Versioned.partDir(tbl, "a", 2)
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(dir), fs, new Path(dir + "__new"), false, hconf)
    fs.create(new Path(dir + "__new/_SUCCESS"), true).close()
    assert(fs.rename(new Path(dir), new Path(dir + "__old")))

    // expire must NOT reclaim the residue — __new is the partition's
    // only complete copy in this window
    Versioned.expire(spark, tbl, keep = 1)
    assert(fs.exists(new Path(dir + "__new")), "expire reclaimed mid-swap residue")
    assert(fs.exists(new Path(dir + "__old")))
    // ...while genuinely dead dirs (v1's superseded partition a) are gone
    assert(!fs.exists(new Path(Versioned.partDir(tbl, "a", 1))))
    assert(fs.exists(new Path(Versioned.partDir(tbl, "b", 1))), "still referenced by v2")

    // the next scrub heals the swap FIRST, then the table reads whole
    Forget.scrubVersioned(spark, tbl, Seq(2L).toDF("id"), Seq("id"))
    assert(fs.exists(new Path(dir)) && !fs.exists(new Path(dir + "__new")))
    val (_, _, missing, orphans) = Versioned.fsck(spark, tbl)
    assert(missing === 0L && orphans === 0L)
    assert(Versioned.readAsOf(spark, tbl).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (3L, "a", 3.0)), "scrubbed key stays gone; the rest intact")
  }

  test("a lost clone-local generation fails loudly instead of serving the source's same-numbered one") {
    // After the clone point both sides number generations up from the
    // same base, so the source's LATER gen numbers collide with
    // clone-local ones. A lost clone-local dir must never silently
    // resolve to the source's different-content generation — the
    // recorded base bound in the __source marker forbids chaining past
    // the clone point.
    val root = Files.createTempDirectory("graft-clone-collide").toString
    val src = s"$root/src"
    val dst = s"$root/clone"
    Versioned.commit(spark, src, rows(Seq((1L, "a", 1.0))), "part", Seq("id"))
    Versioned.commit(spark, src, rows(Seq((2L, "a", 2.0))), "part", Seq("id"))
    Versioned.shallowClone(spark, src, dst) // base bound = gen 2

    // source advances past the clone point: its gen 3 now exists
    Versioned.commit(spark, src, rows(Seq((1L, "a", 666.0))), "part", Seq("id"))
    // clone's own first commit is ALSO gen 3 (the collision)
    Versioned.commit(spark, dst, rows(Seq((1L, "a", 10.0))), "part", Seq("id"))

    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate corruption/manual cleanup: the clone-local gen-3 dir dies
    fs.delete(new Path(s"$dst/gen/__gen=3/__p=a"), true)

    // read fails loudly (the source's gen-3 '666' row must NOT surface)
    val ex = intercept[Exception](Versioned.readAsOf(spark, dst).collect())
    assert(ex.getMessage != null)
    // and fsck counts the ref missing, not healthy
    val (_, _, missing, _) = Versioned.fsck(spark, dst)
    assert(missing === 1L, s"lost clone-local gen must be missing, got $missing")
    // refs at or below the bound still chain-resolve to the source
    assert(Versioned.readAsOf(spark, dst, 2).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "a", 2.0)))
  }

  test("clone of a clone resolves through the source chain; cloning an older version works") {
    val root = Files.createTempDirectory("graft-clone-chain").toString
    val src = s"$root/src"
    val c1 = s"$root/c1"
    val c2 = s"$root/c2"
    Versioned.commit(spark, src, rows(Seq((1L, "a", 1.0), (3L, "b", 3.0))), "part", Seq("id"))
    Versioned.commit(spark, src, rows(Seq((1L, "a", 10.0))), "part", Seq("id"))

    // clone at the OLDER version: reads v1's state, not the head
    val v1clone = s"$root/old"
    Versioned.shallowClone(spark, src, v1clone, version = 1)
    assert(Versioned.readAsOf(spark, v1clone).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (3L, "b", 3.0)))

    // chain: src -> c1 (localizes partition a) -> c2
    Versioned.shallowClone(spark, src, c1)
    Versioned.commit(spark, c1, rows(Seq((1L, "a", 99.0))), "part", Seq("id"))
    Versioned.shallowClone(spark, c1, c2)
    // c2 serves a from c1's local gen and b from the ORIGINAL src —
    // two hops of source-chain resolution in one read
    assert(Versioned.readAsOf(spark, c2).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 99.0), (3L, "b", 3.0)))
    val fs = new Path(c2).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$c2/gen")), "chained clone is still zero-copy")
    assert(Versioned.fsck(spark, c2)._3 === 0L, "no ref may count missing through the chain")
  }

  test("expireDryRun reports exactly what expire then reclaims") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0), (3L, "b", 3.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 10.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 100.0))), "part", Seq("id"))
    // keep=2 retains v2,v3: a@1 is unreferenced (reclaim); b@1 survives
    // (v2 and v3 still carry it); a@2, a@3 live
    val (dropped, reclaim, kept) = Versioned.expireDryRun(spark, tbl, keep = 2)
    assert(dropped === Seq(1L) && reclaim === 1L && kept === 3L)
    Versioned.expire(spark, tbl, keep = 2)
    // post-expire: the plan was exact — nothing further reclaimable
    assert(Versioned.expireDryRun(spark, tbl, keep = 2) === ((Seq.empty[Long], 0L, 3L)))
    assert(Versioned.fsck(spark, tbl)._3 === 0L)
  }

  test("keyHistory derives per-key changes from generation files, O(sum of deltas)") {
    val tbl = freshTbl()
    // v1: 4 keys across 2 partitions; v2 rewrites partition a (id=2
    // changed, id=1 rides along unchanged); v3 rewrites b (id=3 changed)
    Versioned.commit(spark, tbl,
      rows(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))),
      "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((2L, "a", 20.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((3L, "b", 30.0))), "part", Seq("id"))
    // plant ORPHAN crash debris: generation data, no manifest — it must
    // never surface in the history
    rows(Seq((9L, "a", 99.0))).withColumn("__p", col("part").cast("string"))
      .write.mode("overwrite").partitionBy("__p").parquet(s"$tbl/gen/__gen=7")

    val hist = Versioned.keyHistory(spark, tbl, Seq("id"), Seq("value"))
    val got = hist.select(col("id"), col("version"), col("value"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 1L, 3.0), (4L, 1L, 4.0), // first appearance
      (2L, 2L, 20.0), (3L, 3L, 30.0)), // only the keys that CHANGED
      "ride-along rows dropped, orphan debris invisible")

    // PLAN EVIDENCE: the parquet scan reads each generation file ONCE —
    // committed post-image rows v1=4, v2=2 (partition a post-state),
    // v3=2 (partition b), plus the 1 orphan row the manifest semi-join
    // drops post-scan = 9 total — strictly below the versions x table
    // cost (3 x 4 = 12) the AS-OF-union plan would pay, and the gap
    // widens with every version. The semi-join output is exactly the
    // committed rows (8).
    val metrics = graft.plans.PlanMetrics.actualRows(hist)
    val scanRows = metrics.filter(_.node.toLowerCase.contains("scan parquet"))
      .flatMap(_.outputRows).sum
    assert(scanRows === 9L, s"scan must read gen files once, got $scanRows")
    assert(scanRows < 3L * 4L + 1L, "strictly below the versions x table bound")
    val joinRows = graft.plans.PlanMetrics.rowsOf(metrics, "BroadcastHashJoin")
    assert(joinRows === Some(8L),
      s"manifest semi-join keeps exactly the committed post-image rows, got $joinRows")
  }

  test("keyHistory tombstones deletes: a forgotten key's last payload never reads as current") {
    val tbl = freshTbl()
    // v1: 4 keys / 2 partitions; v2: in-partition delete (id=2 removed,
    // id=1 survives the rewrite of a); v3: partition b EMPTIED by
    // deleting both its keys (b leaves the manifest — no gen dir at
    // v3); v4: id=2 REINSERTED with its ORIGINAL payload
    Versioned.commit(spark, tbl,
      rows(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))),
      "part", Seq("id"))
    Versioned.deleteKeys(spark, tbl, Seq(2L).toDF("id"), Seq("id"))
    Versioned.deleteKeys(spark, tbl, Seq(3L, 4L).toDF("id"), Seq("id"))
    Versioned.commit(spark, tbl, rows(Seq((2L, "a", 2.0))), "part", Seq("id"))
    val hist = Versioned.keyHistory(spark, tbl, Seq("id"), Seq("value"))
    val got = hist.select(col("id"), col("version"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set(
      (1L, 1L, Some(1.0)), (2L, 1L, Some(2.0)),
      (3L, 1L, Some(3.0)), (4L, 1L, Some(4.0)),
      (2L, 2L, None), // in-partition delete tombstone
      (3L, 3L, None), (4L, 3L, None), // emptied-partition tombstones
      (2L, 4L, Some(2.0))), // reinsert emits even with unchanged payload
      "every deletion leaves a tombstone; reinserts after a tombstone re-emit")
    // the audit-trail question that motivated this: id=3's LAST event
    // is a null-payload tombstone, not its old payload
    val last3 = hist.filter(col("id") === 3L)
      .orderBy(col("version").desc).limit(1).collect()(0)
    assert(last3.isNullAt(last3.fieldIndex("value")),
      "a forgotten key's history ends in a tombstone")
    // still ONE scan of the generation files (the O(sum deltas) bound):
    // v1=4 rows, v2 rewrote a as 1 survivor row, v4 rewrote a as 2 rows
    val metrics = graft.plans.PlanMetrics.actualRows(hist)
    val scanRows = metrics.filter(_.node.toLowerCase.contains("scan parquet"))
      .flatMap(_.outputRows).sum
    assert(scanRows === 7L, s"tombstones must not re-scan the feed, got $scanRows")
  }

  test("keyHistory cost scales with deltas, not versions x table (20-version chain)") {
    val tbl = freshTbl()
    // base: 100 rows over 10 partitions, then 20 single-key commits,
    // each touching ONE partition — the long-history shape where the
    // AS-OF-union plan pays 21 full table reads (2100 rows) and the
    // change feed pays base + 20 partition post-images
    val base = (0 until 100).map(i => (i.toLong, s"p${i % 10}", i.toDouble))
      .toDF("id", "part", "value")
    Versioned.commit(spark, tbl, base, "part", Seq("id"))
    (1 to 20).foreach { v =>
      Versioned.commit(spark, tbl,
        rows(Seq(((v % 100).toLong, s"p${v % 10}", 1000.0 + v))), "part", Seq("id"))
    }
    val hist = Versioned.keyHistory(spark, tbl, Seq("id"), Seq("value"))
    val metrics = graft.plans.PlanMetrics.actualRows(hist)
    val scanRows = metrics.filter(_.node.toLowerCase.contains("scan parquet"))
      .flatMap(_.outputRows).sum
    // each single-key commit rewrites its 10-row partition post-image:
    // 100 (base) + 20 x 10 = 300 scanned rows, vs 21 x 100 = 2100 for
    // the per-version union — the gap widens linearly with history
    assert(scanRows === 300L, s"change-feed scan must be delta-sized, got $scanRows")
    assert(scanRows * 7 === 2100L, "7x below the versions x table cost at 21 versions")
    // and the history itself is right: each touched key shows its change
    val changed = hist.filter(col("version") > 1).count()
    assert(changed === 20L, s"20 single-key commits -> 20 change rows, got $changed")
  }

  test("compactPartitions: no-op when compact, conflict-aborts on races, expire reclaims after") {
    val root = Files.createTempDirectory("graft-compact").toString
    val tbl = s"$root/t"
    // fragment partition a: the second commit's merge write lands one
    // file per shuffle task
    Versioned.commit(spark, tbl,
      rows(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))), "part", Seq("id"))
    Versioned.commit(spark, tbl,
      rows((10L to 40L).map(i => (i, "a", i.toDouble))), "part", Seq("id"))
    val (nParts, before) = Versioned.dataFileCount(spark, tbl)
    assert(nParts === 2L)
    assert(before > nParts, s"fixture must fragment, got $before files")
    val vmap = Versioned.compactPartitions(spark, s"$root/txnC", tbl, "part")
    assert(vmap === Map(tbl -> 3L))
    val (_, after) = Versioned.dataFileCount(spark, tbl)
    assert(after === nParts, "one file per partition after compaction")
    assert(Versioned.readAsOf(spark, tbl).count() === 34L, "content preserved")
    // already compact -> no-op, no version minted
    assert(Versioned.compactPartitions(spark, s"$root/txnN", tbl, "part") === Map.empty)
    assert(Versioned.latestVersion(spark, tbl) === 3L)
    // superseded small generations reclaim once history expires
    val (_, reclaimable, _) = Versioned.expireDryRun(spark, tbl, keep = 1)
    assert(reclaimable > 0L, "compaction leaves old gens for expire to reclaim")
    Versioned.expire(spark, tbl, keep = 1)
    assert(Versioned.fsck(spark, tbl) === ((1L, 2L, 0L, 0L)))
    // a racing commit between fragmentation check and the txn aborts
    // the compaction loudly (expectedVersion conflict), never a silent
    // mixed rewrite — simulate by re-fragmenting then racing
    Versioned.commit(spark, tbl,
      rows((50L to 90L).map(i => (i, "b", i.toDouble))), "part", Seq("id"))
    val (_, fragAgain) = Versioned.dataFileCount(spark, tbl)
    assert(fragAgain > nParts)
    // hold the next slot like a concurrent writer would
    graft.operators.Txn.crashAfterPrepare(spark, s"$root/peer", Seq(
      graft.operators.Txn.Write(tbl, rows(Seq((99L, "a", 9.0))), "part", Seq("id"))))
    val e = intercept[graft.operators.Txn.TxnConflictException] {
      Versioned.compactPartitions(spark, s"$root/txnR", tbl, "part")
    }
    assert(e.getMessage.contains("conflict"))
    assert(graft.operators.Txn.recover(spark, s"$root/peer") === "rolledback")
  }

  test("followChanges discovers each commit's files incrementally across restarts") {
    val root = Files.createTempDirectory("graft-follow").toString
    val tbl = s"$root/t"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0), (3L, "b", 3.0))), "part", Seq("id"))
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("part", org.apache.spark.sql.types.StringType)
      .add("value", org.apache.spark.sql.types.DoubleType)
    def drain(): Unit = {
      val q = Versioned.followChanges(spark, tbl, schema)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 2, "first drain = v1's two rows")

    // a commit touching ONE partition: the resumed stream must pick up
    // exactly that generation's files (merged partition a: ids 1 and 2)
    Versioned.commit(spark, tbl, rows(Seq((2L, "a", 2.0))), "part", Seq("id"))
    drain()
    val byGen = spark.read.parquet(out).groupBy(col("__gen")).count()
      .as[(Int, Long)].collect().toMap
    assert(byGen === Map(1 -> 2L, 2 -> 2L),
      "second drain adds ONLY generation 2's rewritten partition (2 rows)")
  }

  test("materialize localizes shared partitions; scrub refuses until then") {
    val root = Files.createTempDirectory("graft-clone-mat").toString
    val src = s"$root/src"
    val dst = s"$root/clone"
    Versioned.commit(spark, src, rows(Seq((1L, "a", 1.0), (3L, "b", 3.0))), "part", Seq("id"))
    val v0 = Versioned.shallowClone(spark, src, dst)

    // scrubbing a still-shared clone must refuse loudly (it would rewrite
    // the SOURCE's files in place)
    val boom = intercept[IllegalArgumentException] {
      graft.operators.Forget.scrubVersioned(spark, dst,
        Seq(1L).toDF("id"), Seq("id"))
    }
    assert(boom.getMessage.contains("materialize"))

    val vMat = Versioned.materialize(spark, dst)
    assert(vMat === v0 + 1)
    val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$dst/gen/__gen=${v0 + 1}/__p=a")))
    assert(fs.exists(new Path(s"$dst/gen/__gen=${v0 + 1}/__p=b")))
    assert(Versioned.readAsOf(spark, dst).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (3L, "b", 3.0)), "materialize is content-preserving")
    // drop the still-shared pre-materialize version, then scrub succeeds
    Versioned.expire(spark, dst, keep = 1)
    val rep = graft.operators.Forget.scrubVersioned(spark, dst,
      Seq(1L).toDF("id"), Seq("id"))
    assert(rep.rowsRemoved === 1L && rep.rowsRemaining === 1L)
    assert(Versioned.readAsOf(spark, dst).as[(Long, String, Double)].collect().toSet ===
      Set((3L, "b", 3.0)))
    // the source never felt any of it
    assert(Versioned.readAsOf(spark, src).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (3L, "b", 3.0)))
  }

  test("dropPartitions is a metadata-only TTL delete with time travel; expire reclaims") {
    val tbl = freshTbl()
    val v1 = Versioned.commit(spark, tbl,
      rows(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0))),
      "part", Seq("id"))
    val v2 = Versioned.dropPartitions(spark, tbl, p => p == "c")
    assert(v2 === v1 + 1)
    assert(Versioned.readAsOf(spark, tbl).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)), "head omits the dropped partition")
    assert(Versioned.readAsOf(spark, tbl, v1).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0)),
      "the drop never touched data: pre-drop versions still read it")
    // the dropped partition's generation survives until retention expires it
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$tbl/gen/__gen=1/__p=c")))
    Versioned.expire(spark, tbl, keep = 1)
    assert(!fs.exists(new Path(s"$tbl/gen/__gen=1/__p=c")), "expire reclaims the dropped generation")
    assert(Versioned.readAsOf(spark, tbl).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)))
    // refusing to drop everything
    val e = intercept[IllegalArgumentException] {
      Versioned.dropPartitions(spark, tbl, _ => true)
    }
    assert(e.getMessage.contains("refuse"))
  }

  test("deleteKeys rewrites only affected partitions, empties drop out, history intact") {
    val tbl = freshTbl()
    val v1 = Versioned.commit(spark, tbl,
      rows(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0))),
      "part", Seq("id"))
    // no-match delete is a no-op returning the current version
    assert(Versioned.deleteKeys(spark, tbl, Seq(99L).toDF("id"), Seq("id")) === v1)
    // delete 2 (partial partition a) and 4 (ALL of partition c)
    val v2 = Versioned.deleteKeys(spark, tbl, Seq(2L, 4L).toDF("id"), Seq("id"))
    assert(v2 === v1 + 1)
    assert(Versioned.readAsOf(spark, tbl).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (3L, "b", 3.0)))
    assert(Versioned.readAsOf(spark, tbl, v1).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0)),
      "history untouched")
    // partition b was untouched: its generation ref must still be gen 1
    // (rewrite localized to affected partitions only)
    val refs = spark.read.parquet(s"$tbl/manifest/v=$v2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(refs("b") === 1L, s"untouched partition must carry its old gen: $refs")
    assert(refs("a") === v2, "affected partition rewritten under the new gen")
    assert(!refs.contains("c"), "fully-deleted partition leaves the manifest")
    // a later commit resurrects a deleted key (full-state semantics)
    Versioned.commit(spark, tbl, rows(Seq((4L, "c", 44.0))), "part", Seq("id"))
    assert(Versioned.readAsOf(spark, tbl).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (3L, "b", 3.0), (4L, "c", 44.0)))
  }

  test("commitCas serializes two concurrent writers into consecutive lossless versions") {
    val tbl = freshTbl()
    Versioned.commit(spark, tbl, rows(Seq((1L, "a", 1.0), (2L, "b", 2.0))),
      "part", Seq("id"))
    // two writers with disjoint keys race; CAS must serialize them so the
    // later manifest carries the earlier one's refs (no lost update)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val go = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def writer(delta: Seq[(Long, String, Double)]): Runnable = () => {
      go.await()
      results.add(Versioned.commitCas(spark, tbl, rows(delta), "part", Seq("id")))
    }
    pool.submit(writer(Seq((3L, "a", 3.0))))
    pool.submit(writer(Seq((4L, "b", 4.0))))
    go.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val vs = results.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    assert(vs.toSeq === Seq(2L, 3L), s"consecutive versions expected: ${vs.toSeq}")
    assert(Versioned.readAsOf(spark, tbl).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0), (4L, "b", 4.0)),
      "both writers' deltas must survive")
    // a crashed reservation stalls successors loudly instead of losing updates
    val fs = new Path(tbl).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.createNewFile(new Path(s"$tbl/manifest/reservations/v=4")))
    val e = intercept[IllegalArgumentException] {
      Versioned.commitCas(spark, tbl, rows(Seq((5L, "a", 5.0))), "part", Seq("id"),
        waitMs = 300L)
    }
    assert(e.getMessage.contains("reserved but uncommitted"))
    // operator-guided recovery: delete the stale reservation and retry
    fs.delete(new Path(s"$tbl/manifest/reservations/v=4"), false)
    val v = Versioned.commitCas(spark, tbl, rows(Seq((5L, "a", 5.0))), "part", Seq("id"))
    assert(v === 4L, s"retry reclaims the cleaned slot: $v")
    assert(Versioned.readAsOf(spark, tbl).count() === 5)
  }
}
