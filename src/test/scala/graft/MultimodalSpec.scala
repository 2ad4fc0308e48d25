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
    val byKind = rows.groupBy(_.kind)
    // video carries REAL decoded signals: frame count, duration s,
    // mean luma and motion (then zero padding)
    byKind("video").foreach { r =>
      assert(r.feature(0) >= 2.0f && r.feature(0) <= 4.0f, s"frames: ${r.asset_id}")
      assert(r.feature(1) === r.feature(0) * 0.25f, s"duration at 4 fps: ${r.asset_id}")
      assert(r.feature(2) > 0.0f && r.feature(2) <= 1.0f, s"mean luma: ${r.asset_id}")
    }
    // audio carries REAL signal stats: rms/zcr/peak in [0, 1], then zeros
    byKind("audio").foreach { r =>
      assert(r.feature.take(3).forall(v => v >= 0.0f && v <= 1.0f), r.asset_id)
      assert(r.feature(0) > 0.1f, s"sine rms must be well above zero: ${r.asset_id}")
    }
    // images carry REAL pixel statistics: channel/luma means in [0, 1]
    byKind("image").foreach { r =>
      assert(r.feature.take(4).forall(v => v >= 0.0f && v <= 1.0f), r.asset_id)
    }
    // determinism: rerun produces identical vectors
    val again = Multimodal.extractFeatures(assets, dims = 16).collect()
      .map(r => r.asset_id -> r.feature.toSeq).toMap
    assert(rows.forall(r => again(r.asset_id) == r.feature.toSeq))
  }

  test("synthetic PNGs are real: ImageIO decodes them at declared dims") {
    assets.filter(_.kind == "image").collect().foreach { a =>
      val dims = ImageCodec.dimensions(a.bytes)
      assert(dims === Some((a.meta.width, a.meta.height)),
        s"asset ${a.asset_id}: decoded $dims, declared ${(a.meta.width, a.meta.height)}")
    }
  }

  test("resize really re-rasterizes: output decodes at the target size") {
    val before = assets.collect().map(a => a.asset_id -> a).toMap
    val resized = Multimodal.resizeImages(assets, 224, 224).collect()
    resized.foreach { a =>
      if (a.kind == "image") {
        assert(a.meta.width === 224 && a.meta.height === 224)
        assert(!java.util.Arrays.equals(a.bytes, before(a.asset_id).bytes))
        // the decisive check: the resized payload is a real PNG of 224x224
        assert(ImageCodec.dimensions(a.bytes) === Some((224, 224)))
      } else {
        assert(a.meta === before(a.asset_id).meta)
        assert(java.util.Arrays.equals(a.bytes, before(a.asset_id).bytes))
      }
    }
  }

  test("pixel features reflect actual pixel content") {
    import java.awt.image.BufferedImage
    def solidPng(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val red = ImageCodec.pixelFeatures(solidPng(0xff0000, 20, 10), 21)
    assert(math.abs(red(0) - 1.0f) < 0.01f, "mean R of a red image is 1")
    assert(red(1) < 0.01f && red(2) < 0.01f, "mean G/B of a red image are 0")
    assert(math.abs(red(4) - 2.0f) < 0.01f, "aspect ratio 20/10 = 2")
    val white = ImageCodec.pixelFeatures(solidPng(0xffffff, 8, 8), 21)
    assert(math.abs(white(3) - 1.0f) < 0.01f, "mean luma of white is 1")
    assert(math.abs(white(20) - 1.0f) < 0.01f, "all luma mass in the top histogram bin")
    val black = ImageCodec.pixelFeatures(solidPng(0x000000, 8, 8), 21)
    assert(black(3) < 0.01f, "mean luma of black is 0")
    assert(math.abs(black(5) - 1.0f) < 0.01f, "all luma mass in the bottom bin")
  }

  test("corrupt image bytes degrade gracefully, not fatally") {
    val junk = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    assert(ImageCodec.dimensions(junk) === None)
    assert(ImageCodec.pixelFeatures(junk, 8).isEmpty)
    assert(ImageCodec.resizePng(junk, 10, 10) === None)
    // through the distributed operator: corrupt asset passes through
    val bad = Seq(MediaAsset(99L, "image", junk, MediaMeta("image/png", 5, 5, 0, 0L))).toDS()
    val out = Multimodal.resizeImages(bad, 10, 10).collect().head
    assert(java.util.Arrays.equals(out.bytes, junk), "undecodable image passes through")
    val feats = Multimodal.extractFeatures(bad, 8).collect().head
    assert(feats.feature.isEmpty)
  }

  test("audio codec decodes real WAV: stream info and content-sensitive features") {
    val wav = Multimodal.AudioCodec.synthesizeWav(440.0, ms = 500)
    val Some((info, samples)) = Multimodal.AudioCodec.decode(wav)
    assert(info.sampleRateHz === 8000 && info.channels === 1)
    assert(info.durationMs === 500 && samples.length === 4000)
    val f440 = Multimodal.AudioCodec.features(wav, 4)
    // 16384-amplitude sine: rms = 0.5/sqrt(2) ~ 0.354; zcr ~ 2f/sr
    assert(math.abs(f440(0) - 0.354f) < 0.01f, s"rms ${f440(0)}")
    assert(math.abs(f440(1) - 2 * 440.0f / 8000) < 0.01f, s"zcr ${f440(1)}")
    // higher frequency -> higher zero-crossing rate
    val f880 = Multimodal.AudioCodec.features(
      Multimodal.AudioCodec.synthesizeWav(880.0, ms = 500), 4)
    assert(f880(1) > f440(1) * 1.5f)
    // corrupt bytes degrade gracefully
    assert(Multimodal.AudioCodec.decode(Array.tabulate[Byte](50)(_.toByte)) === None)
    assert(Multimodal.AudioCodec.features(Array.tabulate[Byte](50)(_.toByte), 4).isEmpty)
  }


  test("decodeAudit: exact-integer decode evidence per kind, corrupt-safe") {
    val audit = Multimodal.decodeAudit(assets).collect().map(a => a.asset_id -> a).toMap
    // image rows carry decoded dims + pixel sums, nothing audio-shaped
    val img = audit(0L)
    assert(img.img_w === Some(16L) && img.img_h === Some(12L))
    assert(img.sum_r.exists(_ > 0) && img.zcr.isEmpty && img.payload_bytes.isEmpty)
    // audio rows carry header + sample facts; duration matches synthesis
    val aud = audit(1L)
    assert(aud.sr_hz === Some(8000L) && aud.duration_ms === Some(300L))
    assert(aud.frames === Some(2400L) && aud.zcr.exists(_ > 0))
    assert(aud.payload_bytes === Some(44L + 2L * 2400L), "44-byte WAV header + 16-bit mono PCM")
    // video rows carry REAL AVI decode facts: dims, frame count,
    // duration, channel sums, and the exact container size
    // (232 header/index bytes + 600 per 16×12 BI_RGB frame)
    val vid = audit(2L) // id 2 → 2 + (2/3)%3 = 2 frames
    assert(vid.img_w === Some(16L) && vid.img_h === Some(12L))
    assert(vid.frames === Some(2L) && vid.duration_ms === Some(500L))
    assert(vid.sum_r.exists(_ > 0) && vid.payload_bytes === Some(232L + 600L * 2))
    // corrupt bytes of a decodable kind degrade to an all-null audit row
    val junk = Seq(MediaAsset(99L, "image", Array.tabulate[Byte](40)(_.toByte),
      MediaMeta("image/png", 5, 5, 0, 0L))).toDS()
    val bad = Multimodal.decodeAudit(junk).collect().head
    assert(bad.img_w.isEmpty && bad.sum_r.isEmpty)
  }

  test("probeImageDims corrects lying metadata from the real payload") {
    val lying = Seq(MediaAsset(7L, "image",
      Multimodal.syntheticPng(7L, 24, 16), MediaMeta("image/png", 999, 999, 0, 0L))).toDS()
    val probed = Multimodal.probeImageDims(lying).collect().head
    assert(probed.meta.width === 24 && probed.meta.height === 16)
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

  test("aHash: 64 bits, popcount consistent, deterministic, and identical rasters collide") {
    val hashes = Multimodal.imageHashes(assets).collect()
    val imageIds = assets.filter(_.kind == "image").collect().map(_.asset_id).toSet
    assert(hashes.map(_.asset_id).toSet === imageIds)
    hashes.foreach { h =>
      assert(h.ahash.length === 64 && h.ahash.forall(c => c == '0' || c == '1'))
      assert(h.n_ones === h.ahash.count(_ == '1'))
    }
    // determinism: a second decode pass yields the same hashes
    val again = Multimodal.imageHashes(assets).collect()
    assert(hashes.sortBy(_.asset_id).toSeq === again.sortBy(_.asset_id).toSeq)
    // identical content → identical hash (the dedup law), regardless of id
    val png = Multimodal.syntheticPng(7L, 16, 12)
    val a = Multimodal.ImageCodec.aHash64(png)
    val b = Multimodal.ImageCodec.aHash64(Multimodal.syntheticPng(7L, 16, 12))
    assert(a.isDefined && a === b)
  }

  test("feature pipeline composes with relational ops (join to embeddings-style table)") {
    val feats = Multimodal.extractFeatures(assets, dims = 8)
    val dims = feats.selectExpr("asset_id", "size(feature) AS d")
    assert(dims.filter($"d" =!= 8).count() === 0)
    val joined = feats.toDF().join(assets.toDF().select($"asset_id", $"kind".as("k")), "asset_id")
    assert(joined.filter($"kind" =!= $"k").count() === 0)
  }

  test("audioEnergy: windows partition the decoded samples; audio only; corrupt-safe") {
    val contour = Multimodal.audioEnergy(assets, frameSamples = 800)
    // only audio assets (id % 3 == 1) emit windows
    assert(contour.select($"asset_id").distinct().as[Long].collect().toSet ===
      (0L until 30L).filter(_ % 3 == 1).toSet)
    // per asset, window sample counts sum to the full decoded length
    // (8 samples/ms at 8 kHz) and every non-final window is full
    val perAsset = contour.groupBy($"asset_id")
      .agg(org.apache.spark.sql.functions.sum($"n_samples").as("n"),
        org.apache.spark.sql.functions.count("*").as("wins"))
      .as[(Long, Long, Long)].collect()
    perAsset.foreach { case (id, n, wins) =>
      val ms = 200 + (id % 5) * 100
      assert(n === 8 * ms, s"asset $id sample total")
      assert(wins === (n + 799) / 800, s"asset $id window count")
    }
    // a sine's full-window energy ≈ n·A²/2 (loose band: integer trunc)
    val e = contour.filter($"n_samples" === 800L).select($"energy").as[Long].head()
    val expected = 800L * 16384L * 16384L / 2
    assert(math.abs(e - expected).toDouble / expected < 0.05)
    // corrupt audio payload emits nothing rather than failing the stage
    val junk = Seq(MediaAsset(99L, "audio", Array.tabulate[Byte](32)(_.toByte),
      MediaMeta("audio/wav", 0, 0, 8000, 100L))).toDS()
    assert(Multimodal.audioEnergy(junk, 800).count() === 0)
  }

  test("audioTones: the dominant DFT bin is the synthesized tone for every asset") {
    val probes = (0 until 8).map(220 + _ * 55)
    val tones = Multimodal.audioTones(
      Multimodal.repartitionForDecode(Multimodal.synthesize(spark, 0L until 60L), 4),
      probes).collect()
    val audioIds = (0L until 60L).filter(_ % 3 == 1)
    assert(tones.length === audioIds.size * probes.size, "K probe rows per audio asset")
    audioIds.foreach { id =>
      val mine = tones.filter(_.asset_id == id)
      val best = mine.maxBy(t => t.c.toDouble * t.c + t.s.toDouble * t.s)
      val expectedHz = 220 + (id % 8) * 55
      assert(best.probe_hz === expectedHz, s"asset $id detected ${best.probe_hz}")
      // and the winning bin dominates: next-best power at least 10x smaller
      val rest = mine.filter(_.probe_hz != best.probe_hz)
        .map(t => t.c.toDouble * t.c + t.s.toDouble * t.s).max
      val bestP = best.c.toDouble * best.c + best.s.toDouble * best.s
      assert(bestP > 10 * rest, s"asset $id margin bestP=$bestP nextP=$rest")
    }
    // corrupt payload emits nothing rather than failing the stage
    val junk = Seq(MediaAsset(98L, "audio", Array.tabulate[Byte](16)(_.toByte),
      MediaMeta("audio/wav", 0, 0, 8000, 100L))).toDS()
    assert(Multimodal.audioTones(junk, probes).count() === 0)
  }

  test("GDLT temporal-delta codec: lossless round trip, real compression, mid-stream resync") {
    import java.awt.image.BufferedImage
    // adversarial frame content: gradients, a cut, AND a static tail
    val frames: Seq[BufferedImage] = (0 until 9).map { f =>
      val img = new BufferedImage(20, 14, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 14; x <- 0 until 20) {
        val v =
          if (f < 4) ((7 * x + 13 * y + 5 * f) % 256)
          else ((13 * x + 7 * y) % 256) // scene cut at f=4, then static
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val delta = VideoCodec.encodeDeltaAvi(frames, fps = 4, keyEvery = 4)
    val plain = VideoCodec.encodeAvi(frames, fps = 4)
    // losslessness: every decoded pixel identical to the BI_RGB decode
    val dd = VideoCodec.decodeFrames(delta)
    val dp = VideoCodec.decodeFrames(plain)
    assert(dd.size === 9 && dp.size === 9)
    dd.zip(dp).foreach { case ((fa, a), (fb, b)) =>
      assert(fa === fb)
      for (y <- 0 until 14; x <- 0 until 20)
        assert(a.getRGB(x, y) === b.getRGB(x, y),
          s"pixel ($x,$y) of frame $fa drifted through the delta codec")
    }
    // the static tail (f=5..8 identical to f=4... f=5 on) compresses:
    // those delta chunks are a single skip op, so the whole file beats
    // the uncompressed container
    assert(delta.length < plain.length,
      s"temporal redundancy must compress: ${delta.length} vs ${plain.length}")
    // decode is genuinely inter-frame: probe survives truncating the
    // movi chain mid-GOP, and frames after the cut keyframe (f=4,8)
    // still decode — the resync points re-anchor the chain
    assert(VideoCodec.probe(delta).exists(_.nFrames === 9))
  }

  test("GDLT: a corrupt delta breaks the chain until the next keyframe, never guesses") {
    import java.awt.image.BufferedImage
    val frames: Seq[BufferedImage] = (0 until 9).map { f =>
      val img = new BufferedImage(12, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 12) {
        val v = (11 * x + 5 * y + 17 * f) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val bytes = VideoCodec.encodeDeltaAvi(frames, fps = 4, keyEvery = 4)
    // corrupt the THIRD 00dc chunk (frame 2, a delta): invalid op byte
    val tag = "00dc".getBytes("US-ASCII")
    var found = 0; var pos = -1; var i = 0
    while (i < bytes.length - 4 && pos < 0) {
      if (bytes(i) == tag(0) && bytes(i + 1) == tag(1)
          && bytes(i + 2) == tag(2) && bytes(i + 3) == tag(3)) {
        found += 1
        if (found == 3) pos = i
      }
      i += 1
    }
    assert(pos > 0, "fixture must contain the third chunk")
    bytes(pos + 12) = 0x7f.toByte // first op byte of the delta payload
    val decoded = VideoCodec.decodeFrames(bytes)
    // frames 0,1 decode; 2 fails; 3 (a delta on the broken chain) is
    // DROPPED rather than applied to the stale predecessor; the GOP at
    // frame 4 re-anchors and 4..8 decode — 7 survivors total
    assert(decoded.size === 7, s"expected 7 surviving frames, got ${decoded.size}")
    val good = VideoCodec.decodeFrames(VideoCodec.encodeDeltaAvi(frames, 4, 4))
    val surviving = Seq(0, 1, 4, 5, 6, 7, 8)
    decoded.map(_._2).zip(surviving.map(good(_)._2)).zipWithIndex.foreach {
      case ((a, b), j) =>
        for (y <- 0 until 8; x <- 0 until 12)
          assert(a.getRGB(x, y) === b.getRGB(x, y),
            s"survivor $j (original frame ${surviving(j)}) pixel ($x,$y) wrong")
    }
  }

  test("m13 shot detection is codec-agnostic: delta-coded cut videos flag the same cuts") {
    // re-encode the m13 cut fixture's FRAMES with the GDLT codec and
    // assert identical per-frame aHashes — shot detection composes on
    // decodeFrames, so a lossless codec must reproduce m13's evidence
    (0L until 6L).foreach { id =>
      val cut = 2 + (id % 3).toInt
      val plainBytes = VideoCodec.synthesizeCutAvi(
        id, w = 16, h = 12, nFrames = 6, cutAt = cut, fps = 4)
      val frames = VideoCodec.decodeFrames(plainBytes).map(_._2)
      val deltaBytes = VideoCodec.encodeDeltaAvi(frames, fps = 4, keyEvery = 3)
      def hashes(bytes: Array[Byte]): Seq[(Int, String)] =
        Multimodal.videoFrameHashes(
            Seq(MediaAsset(id, "video", bytes,
              MediaMeta("video/x-msvideo", 16, 12, 0, 1500L))).toDS())
          .collect().sortBy(_.frame_no).map(f => f.frame_no -> f.ahash).toSeq
      val hp = hashes(plainBytes)
      val hd = hashes(deltaBytes)
      assert(hd === hp, s"asset $id: delta-coded frame hashes must match BI_RGB")
      // and the planted cut still flags: hamming across the boundary
      val hs = hd.map(_._2)
      def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
      assert(ham(hs(cut - 1), hs(cut)) >= 12,
        s"asset $id: cut at $cut must cross the m13 threshold on the delta codec")
    }
  }

  test("deltaMotion reads motion off op headers and bounds the decoded frame diff") {
    import graft.multimodal.Multimodal
    import graft.multimodal.Multimodal.VideoCodec
    (0L until 6L).foreach { id =>
      val cut = 2 + (id % 3).toInt
      val bytes = VideoCodec.synthesizeCutDeltaAvi(
        id, w = 32, h = 24, nFrames = 6, cutAt = cut, fps = 4)
      val motion = VideoCodec.deltaMotion(bytes).toMap
      assert(motion.keySet === (1 to 5).toSet, "one motion row per delta frame")
      // ground truth: per-frame differing bytes from the DECODED frames
      val raws = VideoCodec.decodeFrames(bytes).map { case (f, img) =>
        f -> (0 until img.getHeight).flatMap(y => (0 until img.getWidth).map(x =>
          img.getRGB(x, y) & 0xffffff)).toArray
      }.toMap
      (1 to 5).foreach { f =>
        val diffPx = raws(f).zip(raws(f - 1)).count { case (a, b) => a != b }
        // gray frames: a differing pixel differs in all 3 bytes; writes
        // may GLUE short equal runs, so op bytes upper-bound the diff
        // and never undercount it
        assert(motion(f) >= diffPx * 3L,
          s"asset $id frame $f: op bytes ${motion(f)} must cover ${diffPx * 3} diff bytes")
        if (f == cut) assert(motion(f) === 32L * 24L * 3L,
          s"asset $id: the cut rewrites the whole raster")
        else assert(motion(f) === 96L,
          s"asset $id frame $f: in-scene motion is the square's two spans")
      }
      // the whole motion pass never decoded a pixel: it also works on a
      // truncated-tail container where decode would bail
    }
    // MJPEG/BI_RGB assets simply yield no motion rows (no delta chunks)
    val mj = VideoCodec.synthesizeMjpegAvi(1L, w = 32, h = 24, nFrames = 4, fps = 4)
    assert(VideoCodec.deltaMotion(mj).isEmpty)
  }
}
