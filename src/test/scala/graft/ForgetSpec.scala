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
}
