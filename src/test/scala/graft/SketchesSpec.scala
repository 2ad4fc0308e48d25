package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{CountMin, HllSketch}

/** HLL sketch semantics beyond the a22/k10 DuckDB hash gates: accuracy
  * band, merge algebra, and the incremental streaming fold. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val key = Seq("g")

  test("estimate lands within the HLL error band at 20k and 100k distinct") {
    // m=256 → rse ≈ 6.5%; pin 3×rse ≈ ±20% (deterministic data, so this
    // is a fixed number, not a flaky band)
    for (n <- Seq(20000L, 100000L)) {
      val df = spark.range(n).select(lit(1).as("g"), col("id"))
      val est = HllSketch.estimate(
        HllSketch.registers(df, key, col("id")), key)
        .select("est").as[Double].head()
      assert(math.abs(est - n) / n < 0.20, s"n=$n est=$est")
    }
  }

  test("register merge of any batching equals the one-shot registers, and is idempotent") {
    val df = spark.range(30000)
      .select((col("id") % 3).as("g"), (col("id") * 7919 % 9973).as("v"))
    val full = HllSketch.registers(df, key, col("v"))
    val parts = Seq(0, 1, 2).map(b =>
      HllSketch.registers(df.filter(col("id") % 3 === b), key, col("v")))
    val merged = parts.reduce(HllSketch.merge(_, _, key))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // idempotent: re-merging the same registers changes nothing (the
    // property that makes replay structurally harmless, unlike sums)
    val twice = HllSketch.merge(full, full, key)
    assert(twice.exceptAll(full).isEmpty && full.exceptAll(twice).isEmpty)
  }

  test("count-min never underestimates, merge equals one-shot, unseen keys hit empty cells") {
    import graft.operators.CountMin
    val vals = (1 to 5000).map(i => s"tok${i % 700}").toDF("v")
    val full = CountMin.sketch(vals, col("v"))
    // merge of disjoint halves == one-shot sketch, exactly
    val m = CountMin.merge(
      CountMin.sketch((1 to 2500).map(i => s"tok${i % 700}").toDF("v"), col("v")),
      CountMin.sketch((2501 to 5000).map(i => s"tok${i % 700}").toDF("v"), col("v")))
    assert(m.exceptAll(full).isEmpty && full.exceptAll(m).isEmpty)
    // every estimate >= the true count (the one-sided CMS guarantee)
    val truth = vals.groupBy(col("v")).agg(count(lit(1)).as("n"))
    val bad = CountMin.lookup(full, truth.select("v"), "v")
      .join(truth, Seq("v")).filter(col("est_n") < col("n")).count()
    assert(bad === 0, "CMS must never underestimate")
    // a sketch over FEW values leaves empty cells: unseen keys that hit
    // one estimate 0 (left-join semantics; inner join would inflate)
    val tiny = CountMin.sketch(Seq("a", "b", "c").toDF("v"), col("v"))
    val unseen = (1 to 300).map(i => s"zz$i").toDF("v")
    val zeroes = CountMin.lookup(tiny, unseen, "v").filter(col("est_n") === 0).count()
    assert(zeroes > 250, s"most unseen keys must estimate 0 on a sparse sketch, got $zeroes")
  }

  test("streaming HLL fold equals the full recompute and skips a committed replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("hll-stream").toString + "/regs"
    val ckpt = Files.createTempDirectory("hll-ckpt").toString
    val input = MemoryStream[(Int, Long)]
    val df = input.toDF().toDF("g", "v")
    val q = HllSketch.streamingHllFold(df, path, key, col("v"), ckpt)
    input.addData((1 to 500).map(i => (i % 2, i.toLong * 13)): _*)
    q.processAllAvailable()
    input.addData((1 to 500).map(i => (i % 2, i.toLong * 29)): _*)
    q.processAllAvailable(); q.stop()
    val want = HllSketch.registers(
      ((1 to 500).map(i => (i % 2, i.toLong * 13)) ++
        (1 to 500).map(i => (i % 2, i.toLong * 29))).toDF("g", "v"),
      key, col("v"))
    val got = graft.operators.ReplayGuard.strip(spark.read.parquet(path))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // redeliver batch 1 (crash between swap and checkpoint commit): the
    // guard must skip it — state bytes stay byte-identical, not merely
    // semantically equal
    assert(new java.io.File(s"$ckpt/commits/1").delete())
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    val q2 = HllSketch.streamingHllFold(df, path, key, col("v"), ckpt)
    q2.processAllAvailable(); q2.stop()
    val again = graft.operators.ReplayGuard.strip(spark.read.parquet(path))
    assert(again.exceptAll(want).isEmpty && want.exceptAll(again).isEmpty)
  }

  test("streaming CMS fold equals the one-shot sketch and a committed replay never double-counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("cms-stream").toString + "/cms"
    val ckpt = Files.createTempDirectory("cms-ckpt").toString
    val input = MemoryStream[Long]
    val df = input.toDF().toDF("v")
    val q = CountMin.streamingCmsFold(df, path, col("v"), ckpt)
    input.addData((1 to 400).map(i => (i % 37).toLong): _*)
    q.processAllAvailable()
    input.addData((1 to 400).map(i => (i % 53).toLong): _*)
    q.processAllAvailable(); q.stop()
    val want = CountMin.sketch(
      ((1 to 400).map(i => (i % 37).toLong) ++ (1 to 400).map(i => (i % 53).toLong))
        .toDF("v"), col("v"))
    val got = graft.operators.ReplayGuard.strip(spark.read.parquet(path))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // redeliver batch 1 (crash between swap and checkpoint commit): an
    // ADDITIVE sketch would double-count without the guard
    assert(new java.io.File(s"$ckpt/commits/1").delete())
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    val q2 = CountMin.streamingCmsFold(df, path, col("v"), ckpt)
    q2.processAllAvailable(); q2.stop()
    val again = graft.operators.ReplayGuard.strip(spark.read.parquet(path))
    assert(again.exceptAll(want).isEmpty && want.exceptAll(again).isEmpty,
      "replayed batch must be skipped, not re-added")
  }
}
