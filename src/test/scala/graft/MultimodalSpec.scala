package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Multimodal plumbing: schemas, partitioning, batch shape, and the
  * decode/feature/resize/frame-sample operators over the stub codec.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val assets = Multimodal.synthesize(spark, 0L until 30L)

  test("binary schema round-trips through parquet with typed metadata") {
    val path = java.nio.file.Files.createTempDirectory("mm").toString + "/t"
    assets.write.parquet(path)
    val back = spark.read.parquet(path).as[MediaAsset]
    assert(back.count() === 30)
    val a = back.filter(_.asset_id == 3).head()
    assert(a.kind === "image" && a.meta.mime === "image/png")
    assert(a.bytes.nonEmpty)
  }

  test("feature extraction: stable dims, deterministic, distributed") {
    val feats = Multimodal.extractFeatures(Multimodal.repartitionForDecode(assets, 8), dims = 16)
    assert(feats.rdd.getNumPartitions === 8)
    val rows = feats.collect()
    assert(rows.length === 30)
    assert(rows.forall(_.feature.length === 16))
    assert(rows.forall(_.feature.forall(v => v >= -1.0f && v < 1.0f)))
    // determinism: rerun produces identical vectors
    val again = Multimodal.extractFeatures(assets, dims = 16).collect()
      .map(r => r.asset_id -> r.feature.toSeq).toMap
    assert(rows.forall(r => again(r.asset_id) == r.feature.toSeq))
  }

  test("resize touches only images and updates metadata + payload") {
    val before = assets.collect().map(a => a.asset_id -> a).toMap
    val resized = Multimodal.resizeImages(assets, 224, 224).collect()
    resized.foreach { a =>
      if (a.kind == "image") {
        assert(a.meta.width === 224 && a.meta.height === 224)
        assert(!java.util.Arrays.equals(a.bytes, before(a.asset_id).bytes))
      } else {
        assert(a.meta === before(a.asset_id).meta)
        assert(java.util.Arrays.equals(a.bytes, before(a.asset_id).bytes))
      }
    }
  }

  test("frame sampling: one row per interval, videos only, lazy flatMap") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000).collect()
    val videos = assets.filter(_.kind == "video").collect()
    val expected = videos.map(v => (v.meta.durationMs + 999) / 1000).sum
    assert(frames.length === expected)
    // frame numbering and timestamps are per-asset and monotonic
    frames.groupBy(_.asset_id).foreach { case (_, fs) =>
      val sorted = fs.sortBy(_.frame_no)
      assert(sorted.map(_.ts_ms).toSeq === sorted.indices.map(_ * 1000L))
    }
    // non-videos contribute nothing
    assert(frames.map(_.asset_id).toSet.subsetOf(videos.map(_.asset_id).toSet))
  }

  test("feature pipeline composes with relational ops (join to embeddings-style table)") {
    val feats = Multimodal.extractFeatures(assets, dims = 8)
    val dims = feats.selectExpr("asset_id", "size(feature) AS d")
    assert(dims.filter($"d" =!= 8).count() === 0)
    val joined = feats.toDF().join(assets.toDF().select($"asset_id", $"kind".as("k")), "asset_id")
    assert(joined.filter($"kind" =!= $"k").count() === 0)
  }
}
