package graft

import java.nio.file.Files
import graft.operators.Forget

/** Keyed hard-delete: selective partition rewrite, emptied-partition
  * cleanup, idempotence, unpartitioned staged-swap path.
  */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(partitioned: Boolean): String = {
    val tbl = Files.createTempDirectory("forget").toString + "/t"
    val df = Seq(
      (1L, "p1", "a"), (2L, "p1", "b"), (3L, "p1", "c"),
      (4L, "p2", "d"), (5L, "p2", "e"),
      (6L, "p3", "f"), (7L, "p3", "g")).toDF("k", "p", "v")
    val w = df.write
    (if (partitioned) w.partitionBy("p") else w).parquet(tbl)
    tbl
  }

  private def files(tbl: String, sub: String): Set[String] = {
    val dir = new java.io.File(tbl, sub)
    Option(dir.list()).map(_.toSet).getOrElse(Set.empty)
  }

  test("partitioned scrub rewrites only affected partitions and reports counts") {
    val tbl = freshTable(partitioned = true)
    val untouched = files(tbl, "p=p2")
    val r = Forget.scrub(spark, tbl,
      Seq(Tuple1(1L), Tuple1(3L), Tuple1(6L)).toDF("k"), Seq("k"), Seq("p"))
    assert(r === Forget.Report(3L, 4L))
    // p2 contained no forgotten key: its files are byte-identical
    assert(files(tbl, "p=p2") === untouched)
    val left = spark.read.parquet(tbl).select("k").as[Long].collect().sorted
    assert(left === Seq(2L, 4L, 5L, 7L))
  }

  test("a partition emptied by the scrub is removed from disk") {
    val tbl = freshTable(partitioned = true)
    val r = Forget.scrub(spark, tbl,
      Seq(Tuple1(4L), Tuple1(5L)).toDF("k"), Seq("k"), Seq("p"))
    assert(r === Forget.Report(2L, 5L))
    assert(!new java.io.File(tbl, "p=p2").exists())
    assert(spark.read.parquet(tbl).count() === 5)
  }

  test("scrub is idempotent: re-running the same forget set removes nothing") {
    val tbl = freshTable(partitioned = true)
    val keys = Seq(Tuple1(1L), Tuple1(4L)).toDF("k")
    assert(Forget.scrub(spark, tbl, keys, Seq("k"), Seq("p")).rowsRemoved === 2L)
    assert(Forget.scrub(spark, tbl, keys, Seq("k"), Seq("p")) === Forget.Report(0L, 5L))
  }

  test("unpartitioned scrub goes through the staged swap and converges") {
    val tbl = freshTable(partitioned = false)
    val r = Forget.scrub(spark, tbl, Seq(Tuple1(2L), Tuple1(99L)).toDF("k"), Seq("k"))
    assert(r === Forget.Report(1L, 6L))
    assert(spark.read.parquet(tbl).filter($"k" === 2L).count() === 0)
    // no stage/swap residue
    assert(!new java.io.File(tbl + "__new").exists())
    assert(!new java.io.File(tbl + "__old").exists())
  }

  test("partition path escaping keeps hostile values out of the directory grammar") {
    assert(Forget.escapePart("click") === "click")
    assert(Forget.escapePart("a/b=c d") === "a%2Fb%3Dc%20d")
  }

  // ---- scrub-through-history (Versioned generations) ----

  import graft.operators.{Publish, Versioned}

  /** Two-version table: v1 = 8 keys across 2 partitions, v2 bumps vals
    * for keys 1..4 (partition p1 only — p2's gen-1 dir carries forward,
    * so it is referenced by BOTH manifests). */
  private def versionedTable(): String = {
    val tbl = Files.createTempDirectory("forget-v").toString + "/t"
    val v1 = Seq(
      (1L, "p1", 10), (2L, "p1", 20), (3L, "p1", 30), (4L, "p1", 40),
      (5L, "p2", 50), (6L, "p2", 60), (7L, "p2", 70), (8L, "p2", 80))
      .toDF("k", "p", "v")
    Versioned.commit(spark, tbl, v1, "p", Seq("k"))
    val delta = v1.filter($"k" <= 4).withColumn("v", $"v" + 1)
    Versioned.commit(spark, tbl, delta, "p", Seq("k"))
    tbl
  }

  test("scrubVersioned removes forgotten keys from every retained version") {
    val tbl = versionedTable()
    // key 2 lives in two physical gen dirs (gen1 p1 via v1, gen2 p1 via
    // v2); key 6 lives in ONE shared dir (gen1 p2) referenced by both
    // manifests — covers both the rewrite-per-version and the
    // shared-dir-scrubbed-once shapes.
    val r = Forget.scrubVersioned(spark, tbl,
      Seq(Tuple1(2L), Tuple1(6L)).toDF("k"), Seq("k"))
    assert(r.rowsRemoved === 3L) // k=2 twice (gen1+gen2), k=6 once (shared dir)
    Seq(1L, 2L).foreach { v =>
      val snap = Versioned.readAsOf(spark, tbl, v)
      assert(snap.filter($"k".isin(2L, 6L)).count() === 0, s"version $v")
    }
    // untouched rows survive with version-correct values
    assert(Versioned.readAsOf(spark, tbl, 1).filter($"k" === 3L)
      .select("v").as[Int].head() === 30)
    assert(Versioned.readAsOf(spark, tbl, 2).filter($"k" === 3L)
      .select("v").as[Int].head() === 31)
  }

  test("scrubVersioned heals a crash window mid-history-rewrite and converges") {
    val tbl = versionedTable()
    val keys = Seq(Tuple1(1L)).toDF("k")
    // simulate a crash between the two swap renames of gen2/p1's
    // rewrite: live dir gone, __old holds the only pre-scrub copy
    val dir = new java.io.File(Versioned.partDir(tbl, "p1", 2L))
    assert(dir.exists())
    val old = new java.io.File(dir.getPath + "__old")
    assert(dir.renameTo(old))
    // next scrub heals (rolls back to the live name), then scrubs
    val r = Forget.scrubVersioned(spark, tbl, keys, Seq("k"))
    assert(r.rowsRemoved === 2L) // k=1 in gen1/p1 and gen2/p1
    assert(!old.exists())
    Seq(1L, 2L).foreach { v =>
      assert(Versioned.readAsOf(spark, tbl, v).filter($"k" === 1L).count() === 0)
    }
    // idempotent re-run
    assert(Forget.scrubVersioned(spark, tbl, keys, Seq("k")).rowsRemoved === 0L)
  }

  test("expire never reclaims swap residue from an interrupted scrub") {
    val tbl = versionedTable()
    // forge the dangerous window: gen1/p2 (shared by both manifests)
    // renamed away mid-swap with a complete __new copy pending
    val dir = new java.io.File(Versioned.partDir(tbl, "p2", 1L))
    val nw = new java.io.File(dir.getPath + "__new")
    assert(dir.renameTo(nw))
    // the real protocol's __new is always complete (stagedRewrite writes
    // it with its _SUCCESS) — forge that marker
    assert(new java.io.File(nw, "_SUCCESS").createNewFile()
      || new java.io.File(nw, "_SUCCESS").exists())
    Versioned.expire(spark, tbl, keep = 2)
    assert(nw.exists(), "expire must not delete the only copy (__new residue)")
    // heal via the next scrub, then the table reads whole again
    Forget.scrubVersioned(spark, tbl, Seq(Tuple1(-1L)).toDF("k"), Seq("k"))
    assert(Versioned.readAsOf(spark, tbl, 1).count() === 8)
  }

  // ---- scrub-through-history (Publish runs) ----

  test("scrubPublished removes forgotten keys from every committed run") {
    val root = Files.createTempDirectory("forget-p").toString + "/pub"
    val t1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val noKey = Seq(("x", 1)).toDF("name", "n") // lacks the key column
    Publish.publish(spark, root, Map("t" -> t1, "meta" -> noKey))
    Publish.publish(spark, root, Map(
      "t" -> t1.withColumn("v",
        org.apache.spark.sql.functions.concat($"v",
          org.apache.spark.sql.functions.lit("!"))),
      "meta" -> noKey))
    val r = Forget.scrubPublished(spark, root, Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    assert(r.rowsRemoved === 2L) // once per run
    Seq(1L, 2L).foreach { run =>
      assert(Publish.read(spark, root, "t", run).filter($"k" === 2L).count() === 0)
      assert(Publish.read(spark, root, "t", run).count() === 2)
      // keyless table untouched
      assert(Publish.read(spark, root, "meta", run).count() === 1)
    }
    // idempotent
    assert(Forget.scrubPublished(spark, root, Seq(Tuple1(2L)).toDF("k"), Seq("k"))
      .rowsRemoved === 0L)
  }
}
