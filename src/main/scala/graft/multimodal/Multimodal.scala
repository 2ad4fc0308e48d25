package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns plus typed metadata, processed with
  * iterator-to-iterator `mapPartitions` over typed Datasets — the
  * Scala-native analog of Python's `mapInPandas` batch UDFs. The
  * Spark-side plumbing (schema, partitioning, batch shape, lazy
  * iterators) is real and tested; the actual codec work is STUBBED
  * behind [[StubCodec]] because no image/audio libraries exist in this
  * environment — swap that one object for a JNI/javacv codec in a real
  * deployment, nothing else changes.
  *
  * Scale design:
  *   - decode cost dominates at 100 TB; [[repartitionForDecode]] spreads
  *     assets by hash so one hot partition can't serialize a stage, and
  *     the per-partition iterator lets a real codec amortize init once
  *     per task (the same reason mapInPandas batches).
  *   - frame sampling is a flatMap (1→N) that never materializes a whole
  *     video's frames in memory — the iterator is lazy end-to-end.
  */
object Multimodal {

  final case class MediaMeta(
      mime: String, width: Int, height: Int, sampleRateHz: Int, durationMs: Long)

  final case class MediaAsset(
      asset_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      asset_id: Long, kind: String, n_bytes: Long, feature: Array[Float])

  final case class Frame(
      asset_id: Long, frame_no: Int, ts_ms: Long, bytes: Array[Byte])

  /** ======== STUB ========
    * Deterministic fake codec: derives "decoded" content from an md5 of
    * the bytes. A real deployment replaces exactly this object with a
    * codec-backed implementation (e.g. javacv / TwelveMonkeys); all
    * dataset-level operators below are codec-agnostic.
    */
  object StubCodec {
    private def digest(bytes: Array[Byte], salt: String): Array[Byte] = {
      val md = MessageDigest.getInstance("MD5")
      md.update(salt.getBytes("UTF-8"))
      md.digest(bytes)
    }

    /** "Decode + feature-extract": dims pseudo-activations in [-1, 1). */
    def features(bytes: Array[Byte], dims: Int): Array[Float] =
      (0 until dims).map { d =>
        val h = digest(bytes, s"feat-$d")
        val v = ((h(0) & 0xff) << 8 | (h(1) & 0xff)).toFloat
        v / 32768.0f - 1.0f
      }.toArray

    /** "Resize": deterministic re-encode of the payload at a new size. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      digest(bytes, s"resize-${w}x$h")

    /** "Decode one frame" at a timestamp. */
    def frameAt(bytes: Array[Byte], tsMs: Long): Array[Byte] =
      digest(bytes, s"frame-$tsMs")
  }
  // ======== END STUB ========

  /** Hash-spread assets across `n` tasks before expensive decode work. */
  def repartitionForDecode(ds: Dataset[MediaAsset], n: Int): Dataset[MediaAsset] =
    ds.repartition(n, col("asset_id"))

  /** Batched decode + feature extraction (mapInPandas analog): one lazy
    * iterator per partition, codec state initialized once per task. */
  def extractFeatures(ds: Dataset[MediaAsset], dims: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: initialize the codec HERE, once per partition
      it.map { a =>
        MediaFeatures(a.asset_id, a.kind, a.bytes.length.toLong,
          StubCodec.features(a.bytes, dims))
      }
    }
  }

  /** Image resize: new payload + updated metadata, non-images unchanged. */
  def resizeImages(ds: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map {
        case a if a.kind == "image" =>
          a.copy(bytes = StubCodec.resize(a.bytes, w, h),
            meta = a.meta.copy(width = w, height = h))
        case other => other
      }
    }
  }

  /** Frame sampling: one row per sampled frame every `everyMs` ms of the
    * asset's duration (videos only) — a lazy 1→N flatMap. */
  def sampleFrames(ds: Dataset[MediaAsset], everyMs: Long): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { a =>
      if (a.kind != "video" || a.meta.durationMs <= 0) Iterator.empty
      else (0L until a.meta.durationMs by everyMs).iterator.zipWithIndex.map {
        case (ts, i) => Frame(a.asset_id, i, ts, StubCodec.frameAt(a.bytes, ts))
      }
    }
  }

  /** Synthesize a deterministic media table from ids — test and demo
    * input without real media files. */
  def synthesize(spark: SparkSession, ids: Seq[Long]): Dataset[MediaAsset] = {
    import spark.implicits._
    ids.map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bytes = Array.tabulate[Byte](64 + (id % 32).toInt)(i => ((id * 31 + i) % 127).toByte)
      val meta = kind match {
        case "image" => MediaMeta("image/png", 640, 480, 0, 0L)
        case "audio" => MediaMeta("audio/wav", 0, 0, 16000, 2000L + id % 1000)
        case _       => MediaMeta("video/mp4", 1280, 720, 0, 3000L + (id % 5) * 1000)
      }
      MediaAsset(id, kind, bytes, meta)
    }.toDS()
  }
}
