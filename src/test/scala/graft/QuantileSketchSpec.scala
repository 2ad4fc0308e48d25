package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch

/** Deterministic mergeable quantile summary: size bound, exact weight
  * conservation, partitioning-independence, and the n/k rank guarantee
  * for both one-shot and merged summaries (skewed data included —
  * md5-scatter cells see a uniform slice of any value distribution). */
class QuantileSketchSpec extends SparkSpec {

  private val B = 16
  private val K = 32

  // log-skewed values with a row-unique key, two groups of different sizes
  private def data(n: Int) = spark.range(n).selectExpr(
    "CASE WHEN id % 3 = 0 THEN 'x' ELSE 'y' END AS g",
    "CAST(id AS STRING) AS k",
    "pow(1.001, CAST(id % 9973 AS DOUBLE)) AS v")

  private def summ(df: org.apache.spark.sql.DataFrame) =
    QuantileSketch.summarize(df, Seq("g"), col("v"), col("k"), B, K)

  test("summary is bounded by buckets*k per group and conserves weight exactly") {
    val df = data(50000)
    val s = summ(df)
    val byG = s.groupBy("g").agg(count(lit(1)).as("rows"), sum("wt").as("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val truth = df.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (g, n) =>
      val (rows, w) = byG(g)
      assert(w === n, s"group $g: sample weights must sum to the row count")
      assert(rows <= B.toLong * K, s"group $g: $rows samples exceeds B*K = ${B * K}")
    }
  }

  test("summary is partitioning-independent (deterministic)") {
    val df = data(20000)
    val a = summ(df).collect().map(_.toString).sorted.toSeq
    val b = summ(df.repartition(13, col("k"))).collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("estimates land within the n/k + B rank bound, one-shot and merged") {
    val df = data(40000)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val oneshot = QuantileSketch.quantiles(summ(df), Seq("g"), qs)
    val merged = QuantileSketch.quantiles(
      QuantileSketch.merge(
        summ(df.filter(col("k").cast("long") % 2 === 0)),
        summ(df.filter(col("k").cast("long") % 2 === 1))),
      Seq("g"), qs)
    val truth = df.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def check(est: org.apache.spark.sql.DataFrame, factor: Int, tag: String): Unit =
      est.collect().foreach { r =>
        val (g, q, e) = (r.getString(0), r.getDouble(1), r.getDouble(2))
        val n = truth(g)
        val rank = df.filter(col("g") === g && col("v") <= e).count()
        val target = math.ceil(q * n).toLong
        val slack = factor * (n / K + B) + 2
        assert(math.abs(rank - target) <= slack,
          s"$tag g=$g q=$q: rank $rank vs target $target (slack $slack)")
      }
    check(oneshot, 1, "oneshot")
    check(merged, 2, "merged")
  }

  test("compact bounds the summary, conserves weight, keeps the rank bound") {
    val df = data(40000)
    val many = QuantileSketch.merge(
      QuantileSketch.merge(
        summ(df.filter(col("k").cast("long") % 3 === 0)),
        summ(df.filter(col("k").cast("long") % 3 === 1))),
      summ(df.filter(col("k").cast("long") % 3 === 2)))
    val maxS = 64
    val c = QuantileSketch.compact(many, Seq("g"), maxS)
    val truth = df.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byG = c.groupBy("g").agg(count(lit(1)).as("rows"), sum("wt").as("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    truth.foreach { case (g, n) =>
      val (rows, w) = byG(g)
      assert(w === n, s"group $g: compacted weights must still sum to n")
      assert(rows <= maxS + 1, s"group $g: $rows rows exceeds maxSamples")
    }
    // estimates off the compacted sketch: input bound (3-way merge) +
    // compaction stride (~n/maxS) of extra rank slack
    val qs = Seq(0.25, 0.5, 0.75)
    QuantileSketch.quantiles(c, Seq("g"), qs).collect().foreach { r =>
      val (g, q, e) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val n = truth(g)
      val rank = df.filter(col("g") === g && col("v") <= e).count()
      val target = math.ceil(q * n).toLong
      val slack = 3 * (n / K + B) + n / maxS + 4
      assert(math.abs(rank - target) <= slack,
        s"compacted g=$g q=$q: rank $rank vs target $target (slack $slack)")
    }
  }

  test("streaming fold lands exactly the union of per-batch summaries") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-qfold").toString
    val feed = s"$root/feed"; val summPath = s"$root/summ"; val ckpt = s"$root/ckpt"
    val df = data(30000).withColumn("idl", col("k").cast("long"))
    // two single-file appends -> two micro-batch cohorts (id parity)
    df.filter(col("idl") % 2 === 0).drop("idl").coalesce(1).write.parquet(feed)
    val stream = spark.readStream
      .schema("g STRING, k STRING, v DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(feed)
    val q = QuantileSketch.streamingQuantileFold(
      stream, summPath, Seq("g"), col("v"), col("k"), B, K, ckpt)
    q.processAllAvailable()
    df.filter(col("idl") % 2 === 1).drop("idl").coalesce(1)
      .write.mode("append").parquet(feed)
    q.processAllAvailable()
    q.stop()
    val landed = graft.operators.ReplayGuard.strip(spark.read.parquet(summPath))
      .select(col("g"), col("v"), col("wt"))
      .collect().map(_.toString).sorted.toSeq
    val expected = QuantileSketch.merge(
        summ(df.filter(col("idl") % 2 === 0).drop("idl")),
        summ(df.filter(col("idl") % 2 === 1).drop("idl")))
      .collect().map(_.toString).sorted.toSeq
    assert(landed === expected,
      "streamed summary must equal the union of the two cohort summaries")
  }

  test("streaming fold with MULTI-FILE batches matches union-of-cohorts") {
    // e41 pins determinism with maxFilesPerTrigger=1; here each
    // micro-batch carries SEVERAL files with adversarial splits (range-
    // partitioned by value, so per-file distributions differ wildly) —
    // the md5-keyed scatter makes the batch summary a function of the
    // batch's ROW SET alone, so file count, file order, and in-batch
    // partitioning must all be invisible. The equality below is also
    // the proof the batches really were multi-file: had the source
    // split per file, the landed state would be a union of 7 per-FILE
    // summaries, whose strides differ from the 2 per-cohort ones.
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-qfoldmf").toString
    val feed = s"$root/feed"; val summPath = s"$root/summ"; val ckpt = s"$root/ckpt"
    val df = data(30000).withColumn("idl", col("k").cast("long"))
    val c1 = df.filter(col("idl") % 2 === 0).drop("idl")
    val c2 = df.filter(col("idl") % 2 === 1).drop("idl")
    // each cohort is drained by a query that STARTS AFTER the cohort's
    // multi-file write completes (checkpoint continuity across the
    // restart keeps the seen-file state): a continuously-polling query
    // can list a multi-file append MID-WRITE and split the cohort into
    // partial batches under load — a real-world ingest race, but this
    // test pins exact 2-cohort batch structure, so the write must be
    // quiescent when the source lists
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("g STRING, k STRING, v DOUBLE")
        .option("maxFilesPerTrigger", 8) // > files per append: whole cohort per batch
        .parquet(feed)
      val q = QuantileSketch.streamingQuantileFold(
        stream, summPath, Seq("g"), col("v"), col("k"), B, K, ckpt)
      q.processAllAvailable()
      q.stop()
    }
    c1.repartitionByRange(3, col("v")).write.parquet(feed)
    drain()
    c2.repartitionByRange(4, col("v")).write.mode("append").parquet(feed)
    drain()
    val landed = graft.operators.ReplayGuard.strip(spark.read.parquet(summPath))
      .select(col("g"), col("v"), col("wt"))
      .collect().map(_.toString).sorted.toSeq
    val expected = QuantileSketch.merge(summ(c1), summ(c2))
      .collect().map(_.toString).sorted.toSeq
    assert(landed === expected,
      "multi-file micro-batches must fold exactly like their cohort unions")
  }

  test("bounded fold: maxSamplesPerGroup caps state over many batches, bound holds") {
    // the default fold appends ≤ B·K rows per group per BATCH forever;
    // the bound runs compact() inline so an unbounded stream carries
    // bounded state, paying ≤ ceil(W/bound) extra rank error per fold
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-qfoldcap").toString
    val feed = s"$root/feed"; val summPath = s"$root/summ"; val ckpt = s"$root/ckpt"
    val maxS = 64
    val df = data(40000).withColumn("idl", col("k").cast("long"))
    df.filter(col("idl") % 4 === 0).drop("idl").coalesce(1).write.parquet(feed)
    val stream = spark.readStream
      .schema("g STRING, k STRING, v DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(feed)
    val q = QuantileSketch.streamingQuantileFold(
      stream, summPath, Seq("g"), col("v"), col("k"), B, K, ckpt,
      maxSamplesPerGroup = maxS)
    (1 to 3).foreach { r =>
      q.processAllAvailable()
      df.filter(col("idl") % 4 === r).drop("idl").coalesce(1)
        .write.mode("append").parquet(feed)
    }
    q.processAllAvailable()
    q.stop()
    val landed = graft.operators.ReplayGuard.strip(spark.read.parquet(summPath))
    // state bound: ≤ maxS (+1 for the forced last sample) per group,
    // where unbounded appending would hold 4 batches x ≤ B·K rows
    val perGroup = landed.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perGroup.foreach { case (g, n) =>
      assert(n <= maxS + 1, s"group $g state $n exceeds the $maxS bound") }
    // weight conservation survives every compaction
    val w = landed.groupBy("g").sum("wt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = df.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w === truth, "weights still sum exactly to the stream's row counts")
    // rank quality: 4 folds each add ≤ ceil(W/maxS) error on top of the
    // per-batch summarize bound — check the median lands inside it
    val ests = QuantileSketch.quantiles(landed, Seq("g"), Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    truth.foreach { case (g, n) =>
      val est = ests(g)
      val rank = df.filter(col("g") === g && col("v") <= est).count()
      val slack = 4L * (n / K + B) + 4L * (n / maxS + 1)
      assert(math.abs(rank - math.ceil(0.5 * n).toLong) <= slack,
        s"group $g median rank $rank vs ${math.ceil(0.5 * n).toLong} (slack $slack)")
    }
  }
}
