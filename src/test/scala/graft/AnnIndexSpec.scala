package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** Persistent ANN index: build/append/query must reproduce the one-shot
  * v2 ANN exactly, and appends extend the corpus without rewrites.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sfDir)

  test("index query == one-shot v2 ANN on the same corpus") {
    val path = Files.createTempDirectory("ann").toString + "/idx"
    Similarity.buildIndex(spark, path, emb)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val fromIndex = Similarity.queryIndex(spark, path, queries, k = 10)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    val oneShot = SparkEntry.queries("v2_ann_lsh")(spark, sfDir)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(fromIndex === oneShot)
  }

  test("build half + append half == build all") {
    val all = Files.createTempDirectory("ann").toString + "/idx"
    val grown = Files.createTempDirectory("ann").toString + "/idx"
    Similarity.buildIndex(spark, all, emb)
    Similarity.buildIndex(spark, grown, emb.filter(col("vec_id") % 2 === 0))
    Similarity.appendToIndex(spark, grown, emb.filter(col("vec_id") % 2 === 1))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val a = Similarity.queryIndex(spark, all, queries, k = 10)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    val g = Similarity.queryIndex(spark, grown, queries, k = 10)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a === g)
  }

  test("index is clustered: bucket ranges in file footers are ordered") {
    val path = Files.createTempDirectory("ann").toString + "/idx"
    Similarity.buildIndex(spark, path, emb)
    // query-side cost model: candidates only, never the corpus — the
    // candidate count must be well under |queries| x |corpus|
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val res = Similarity.queryIndex(spark, path, queries, k = 10)
    assert(res.count() === 50) // 5 queries x top-10
  }

  test("IVF index query == one-shot v5 IVF on the same corpus") {
    val path = Files.createTempDirectory("ivf").toString + "/idx"
    Similarity.buildIvfIndex(spark, path, emb)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val fromIndex = Similarity.queryIvfIndex(spark, path, queries, k = 10)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    val oneShot = SparkEntry.queries("v5_ann_ivf")(spark, sfDir)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(fromIndex === oneShot)
    // the cells table is clustered: each parquet file covers a narrow
    // cell range, so probes are range scans
    val cells = spark.read.parquet(s"$path/cells")
    assert(cells.columns.toSet === Set("vec_id", "cell", "q"))
  }

  test("streaming ingest: vectors appended per micro-batch equal a one-shot build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val grown = Files.createTempDirectory("ann-stream").toString + "/idx"
    val whole = Files.createTempDirectory("ann-stream").toString + "/idx"
    Similarity.buildIndex(spark, whole, emb)
    // seed with the even half, stream the odd half in two micro-batches
    Similarity.buildIndex(spark, grown, emb.filter(col("vec_id") % 2 === 0))
    val odd = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .option("checkpointLocation", Files.createTempDirectory("ann-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.appendToIndex(spark, grown, batch); ()
      }.start()
    try {
      val (h1, h2) = odd.splitAt(odd.length / 2)
      input.addData(h1.toSeq: _*); q.processAllAvailable()
      input.addData(h2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val a = Similarity.queryIndex(spark, whole, queries, k = 10)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    val g = Similarity.queryIndex(spark, grown, queries, k = 10)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(g === a, "streamed index must answer identically to the one-shot build")
  }

  test("tombstoned vectors never surface; compaction folds them in and answers identically") {
    val root = Files.createTempDirectory("ann-tomb").toString
    val idx = s"$root/idx"
    Similarity.buildIndex(spark, idx, emb)
    val deleted = emb.filter(col("vec_id") % 13 === 0)
    Similarity.deleteFromIndex(spark, idx, deleted)
    val queries = emb.filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("qid"), col("embedding"))
    val live = Similarity.queryIndexLive(spark, idx, queries, k = 10)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    val deletedIds = deleted.select("vec_id").as[Long].collect().toSet
    assert(live.nonEmpty)
    assert(live.forall { case (_, cid, _) => !deletedIds.contains(cid) },
      "a tombstoned vector surfaced in results")
    // ground truth: an index built WITHOUT the deleted vectors
    val clean = s"$root/clean"
    Similarity.buildIndex(spark, clean, emb.filter(col("vec_id") % 13 =!= 0))
    val truth = Similarity.queryIndex(spark, clean, queries, k = 10)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(live === truth, "tombstone anti-join must equal a rebuild without the ids")
    // compaction folds tombstones in: same answers, tombstone table gone
    Similarity.compactIndex(spark, idx)
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + "_tombstones")))
    val post = Similarity.queryIndexLive(spark, idx, queries, k = 10)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(post === truth)
  }
}
