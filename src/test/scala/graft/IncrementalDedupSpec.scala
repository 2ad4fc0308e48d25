package graft

import java.nio.file.Files
import graft.queries.IncrementalDedup

/** Incremental dedup: increments classify against the persistent index,
  * the index grows by novel docs only, and replays are stable.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val day1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "completely different content about spark execution engines and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // batch dup of 1
    (4L, "short unique text snippet number four with enough tokens to shingle"))
    .toDF("doc_id", "text")

  private val day2 = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (11L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 1
    (12L, "entirely novel second-day document discussing parquet footers and stats"))
    .toDF("doc_id", "text")

  test("exact incremental: batch dups, index dups, growing index, stable replay") {
    val state = Files.createTempDirectory("dedup-state").toString
    val r1 = IncrementalDedup.dedupeExactIncrement(spark, state, day1)
    assert(r1.novel.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 4L))
    val d1 = r1.duplicates.as[(Long, Long, String)].collect().toSet
    assert(d1 === Set((3L, 1L, "exact-batch")))

    val r2 = IncrementalDedup.dedupeExactIncrement(spark, state, day2)
    assert(r2.novel.select("doc_id").as[Long].collect().toSet === Set(11L, 12L),
      "near-dup text is NOT an exact dup; truly novel text is novel")
    val d2 = r2.duplicates.as[(Long, Long, String)].collect().toSet
    assert(d2 === Set((10L, 1L, "exact-index")))

    // replay of day2: doc 10 still dupes 1; 11/12 now in the index but
    // must match only themselves → still novel (self-matches excluded)
    val r2b = IncrementalDedup.dedupeExactIncrement(spark, state, day2)
    assert(r2b.novel.select("doc_id").as[Long].collect().toSet === Set(11L, 12L))
    assert(r2b.duplicates.as[(Long, Long, String)].collect().toSet === Set((10L, 1L, "exact-index")))
  }

  test("near-dup incremental: LSH candidates verified by Jaccard against the index") {
    val state = Files.createTempDirectory("dedup-state").toString
    val r1 = IncrementalDedup.dedupeNearIncrement(spark, state, day1)
    assert(r1.novel.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 4L))
    assert(r1.duplicates.select("doc_id", "matched_doc_id").as[(Long, Long)].collect().toSet
      === Set((3L, 1L)))

    val r2 = IncrementalDedup.dedupeNearIncrement(spark, state, day2)
    val d2 = r2.duplicates.select("doc_id", "matched_doc_id").as[(Long, Long)].collect().toSet
    // 10 is an exact copy (jaccard 1.0) and 11 a near-dup of 1
    assert(d2 === Set((10L, 1L), (11L, 1L)), s"got $d2")
    assert(r2.novel.select("doc_id").as[Long].collect().toSet === Set(12L))

    // the index grew by novel docs only: 1, 2, 4, 12 → 4 docs × 4 bands
    val sigs = spark.read.parquet(s"$state/signatures")
    assert(sigs.select("doc_id").distinct().as[Long].collect().toSet === Set(1L, 2L, 4L, 12L))
    assert(sigs.count() === 16)
    // band rows are slim — shingle sets live ONCE per doc in doc_shingles
    assert(sigs.columns.toSet === Set("doc_id", "band", "sig"),
      "signatures must not carry shingle arrays")
    val shs = spark.read.parquet(s"$state/doc_shingles")
    assert(shs.columns.toSet === Set("doc_id", "shs"))
    assert(shs.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 4L, 12L),
      "exactly one shingle row per novel doc")
  }

  test("streaming near-dup: micro-batches dedupe against the growing index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val state = Files.createTempDirectory("stream-dedup-state").toString
    val novel = Files.createTempDirectory("stream-dedup-novel").toString
    val ckpt = Files.createTempDirectory("stream-dedup-ckpt").toString
    val q = IncrementalDedup.streamingNearDedup(
      input.toDF().toDF("doc_id", "text"), state, novel, ckpt)
    try {
      day1.as[(Long, String)].collect().foreach(r => input.addData(r))
      q.processAllAvailable() // batch 0: 3 dupes within the batch handled
      day2.as[(Long, String)].collect().foreach(r => input.addData(r))
      q.processAllAvailable() // batch 1: 10/11 dupe day-1 docs via the INDEX
    } finally q.stop()
    val out = spark.read.parquet(novel).select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 2L, 4L, 12L),
      "novel output = day-1 survivors + the only truly novel day-2 doc")
  }

  test("near-dup incremental replay is stable") {
    val state = Files.createTempDirectory("dedup-state").toString
    IncrementalDedup.dedupeNearIncrement(spark, state, day1)
    val first = IncrementalDedup.dedupeNearIncrement(spark, state, day2)
    val firstDupes = first.duplicates.select("doc_id", "matched_doc_id")
      .as[(Long, Long)].collect().toSet
    val replay = IncrementalDedup.dedupeNearIncrement(spark, state, day2)
    assert(replay.duplicates.select("doc_id", "matched_doc_id")
      .as[(Long, Long)].collect().toSet === firstDupes)
    assert(replay.novel.select("doc_id").as[Long].collect().toSet === Set(12L))
  }
}
