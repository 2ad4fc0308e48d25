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
}
