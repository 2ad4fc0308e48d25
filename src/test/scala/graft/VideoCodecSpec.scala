package graft

import java.awt.image.BufferedImage

import graft.multimodal.Multimodal.VideoCodec

/** The pure-JVM AVI video codec: lossless BI_RGB round-trip, MJPEG
  * decode, header probing, timestamp frame lookup, corrupt-byte
  * tolerance, and the exact container-size formula the m1/m10 oracles
  * depend on. */
class VideoCodecSpec extends SparkSpec {

  private def frame(seed: Int, w: Int = 16, h: Int = 12): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((seed * 31 + x * 7 + y * 13) % 256) << 16 |
        ((seed * 17 + x * 3) % 256) << 8 | ((seed * 7 + y * 2) % 256))
    img
  }

  private def pixels(img: BufferedImage): Seq[Int] =
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y) & 0xffffff

  test("BI_RGB encode/decode round-trips pixel-exactly, frames in order") {
    val frames = (0 until 3).map(frame(_))
    val avi = VideoCodec.encodeAvi(frames, fps = 4)
    val decoded = VideoCodec.decodeFrames(avi)
    assert(decoded.map(_._1) === Seq(0, 1, 2))
    decoded.zip(frames).foreach { case ((_, got), want) =>
      assert(pixels(got) === pixels(want), "lossless BI_RGB must round-trip exactly")
    }
  }

  test("row padding: widths not divisible by 4 round-trip exactly") {
    val frames = Seq(frame(1, w = 13, h = 7), frame(2, w = 13, h = 7))
    val decoded = VideoCodec.decodeFrames(VideoCodec.encodeAvi(frames, fps = 2))
    assert(decoded.size === 2)
    decoded.zip(frames).foreach { case ((_, got), want) =>
      assert(pixels(got) === pixels(want), "4-byte row alignment must be transparent")
    }
  }

  test("probe reads dimensions, frame count, and frame duration from the header") {
    val avi = VideoCodec.synthesizeAvi(5L, w = 16, h = 12, nFrames = 4, fps = 4)
    val info = VideoCodec.probe(avi).get
    assert(info.w === 16 && info.h === 12 && info.nFrames === 4)
    assert(info.usPerFrame === 250000L && info.durationMs === 1000L)
  }

  test("container size is the oracle formula: 232 + 600 bytes per 16x12 frame") {
    for (n <- 1 to 4) {
      val avi = VideoCodec.synthesizeAvi(7L, 16, 12, n, fps = 4)
      assert(avi.length === 232 + 600 * n, s"n=$n")
    }
  }

  test("frameAt returns the frame covering a timestamp, clamped to the last") {
    val frames = (0 until 4).map(frame(_))
    val avi = VideoCodec.encodeAvi(frames, fps = 4) // 250 ms per frame
    assert(pixels(VideoCodec.frameAt(avi, 0L).get) === pixels(frames(0)))
    assert(pixels(VideoCodec.frameAt(avi, 260L).get) === pixels(frames(1)))
    assert(pixels(VideoCodec.frameAt(avi, 999L).get) === pixels(frames(3)))
    assert(pixels(VideoCodec.frameAt(avi, 99999L).get) === pixels(frames(3)), "clamped")
  }

  test("MJPEG chunks decode through the JDK JPEG reader") {
    // hand-assemble an AVI whose frames are JPEG-encoded ('00dc') by
    // patching a BI_RGB container's movi chunks is fragile; instead
    // verify the decode path directly on a JPEG payload embedded as a
    // dc chunk in a minimal container built from the encoder's layout
    val img = frame(3)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val avi = mjpegAvi(Seq(jpeg), w = 16, h = 12, fps = 4)
    val decoded = VideoCodec.decodeFrames(avi)
    assert(decoded.size === 1)
    val got = decoded.head._2
    assert(got.getWidth === 16 && got.getHeight === 12)
    // JPEG is lossy: structural agreement, not pixel equality — mean
    // luma must land near the source's
    def meanLuma(i: BufferedImage): Double =
      pixels(i).map(p => (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
        114 * (p & 0xff)) / 1000.0).sum / (16 * 12)
    assert(math.abs(meanLuma(got) - meanLuma(img)) < 16.0)
  }

  /** Minimal MJPEG AVI built from the same RIFF layout the encoder
    * writes, with '00dc' JPEG chunks. */
  private def mjpegAvi(jpegs: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def fcc(s: String) = (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
    val padded = jpegs.map(j => j ++ new Array[Byte](j.length & 1))
    val n = jpegs.size
    val moviContent = 4 + padded.map(8 + _.length).sum
    val hdrlContent = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val total = 12 + (8 + hdrlContent) + (8 + moviContent)
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(fcc("RIFF")).putInt(total - 8).putInt(fcc("AVI "))
    buf.putInt(fcc("LIST")).putInt(hdrlContent).putInt(fcc("hdrl"))
    buf.putInt(fcc("avih")).putInt(56)
    buf.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(n).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    buf.putInt(fcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).putInt(fcc("strl"))
    buf.putInt(fcc("strh")).putInt(56)
    buf.putInt(fcc("vids")).putInt(fcc("MJPG")).putInt(0).putInt(0)
      .putInt(0).putInt(1).putInt(fps).putInt(0).putInt(n)
      .putInt(0).putInt(0).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    buf.putInt(fcc("strf")).putInt(40)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(fcc("MJPG")).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    buf.putInt(fcc("LIST")).putInt(moviContent).putInt(fcc("movi"))
    padded.zip(jpegs).foreach { case (p, j) =>
      buf.putInt(fcc("00dc")).putInt(j.length).put(p)
    }
    buf.array()
  }

  test("MJPEG encoder: container probes correctly and every frame decodes in order") {
    val frames = (0 until 3).map(frame(_))
    val avi = VideoCodec.encodeMjpegAvi(frames, fps = 4)
    val info = VideoCodec.probe(avi).get
    assert(info.w === 16 && info.h === 12 && info.nFrames === 3)
    assert(info.usPerFrame === 250000L)
    val decoded = VideoCodec.decodeFrames(avi)
    assert(decoded.map(_._1) === Seq(0, 1, 2))
    assert(decoded.forall { case (_, i) => i.getWidth === 16 && i.getHeight === 12 })
  }

  test("solid gray survives the JPEG round trip exactly — the m12 gate's premise") {
    val bad = (28 until 228).flatMap { g =>
      val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) img.setRGB(x, y, (g << 16) | (g << 8) | g)
      val avi = VideoCodec.encodeMjpegAvi(Seq(img), fps = 4)
      val got = VideoCodec.decodeFrames(avi).head._2
      if (pixels(got).forall(_ == ((g << 16) | (g << 8) | g))) None else Some(g)
    }
    assert(bad.isEmpty, s"gray values not preserved by the JPEG round trip: $bad")
  }

  test("odd-length JPEG chunks keep the stream aligned (even-byte padding)") {
    // force varied chunk sizes with varied frames; all must still decode
    val frames = (0 until 5).map(s => frame(s * 13 + 1, w = 17, h = 11))
    val decoded = VideoCodec.decodeFrames(VideoCodec.encodeMjpegAvi(frames, fps = 2))
    assert(decoded.map(_._1) === (0 until 5))
  }

  test("MJPEG re-encode of BI_RGB footage stays near-dup by frame fingerprints") {
    import graft.multimodal.Multimodal
    val frames = (0 until 3).map(frame(_))
    val meta = Multimodal.MediaMeta("video/x-msvideo", 16, 12, 0, 750L)
    val assets = Seq(
      Multimodal.MediaAsset(1L, "video", VideoCodec.encodeAvi(frames, fps = 4), meta),
      Multimodal.MediaAsset(2L, "video",
        VideoCodec.encodeMjpegAvi(frames, fps = 4, quality = 0.95f), meta))
    import spark.implicits._
    val fh = Multimodal.videoFrameHashes(assets.toDS()).collect()
      .groupBy(_.asset_id).view.mapValues(_.sortBy(_.frame_no).map(_.ahash)).toMap
    val dists = fh(1L).zip(fh(2L)).map { case (a, b) =>
      a.zip(b).count { case (x, y) => x != y }
    }
    assert(dists.size === 3)
    assert(dists.forall(_ <= 8), s"per-frame aHash hamming too large: ${dists.toSeq}")
  }

  test("corrupt or foreign bytes probe to None and decode to empty") {
    assert(VideoCodec.probe(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoCodec.decodeFrames(Array.tabulate[Byte](500)(_.toByte)).isEmpty)
    val png = graft.multimodal.Multimodal.syntheticPng(1L, 8, 8)
    assert(VideoCodec.probe(png).isEmpty, "a PNG is not an AVI")
    // truncated AVI: header survives, frames degrade gracefully
    val avi = VideoCodec.synthesizeAvi(3L, 16, 12, 3, 4)
    val truncated = java.util.Arrays.copyOf(avi, avi.length / 2)
    assert(VideoCodec.decodeFrames(truncated).size < 3)
  }

  test("features are real decoded signals: count, duration, luma, motion") {
    val static = VideoCodec.encodeAvi(Seq(frame(1), frame(1), frame(1)), fps = 4)
    val moving = VideoCodec.encodeAvi(Seq(frame(1), frame(50), frame(99)), fps = 4)
    val fs = VideoCodec.features(static, 8)
    val fm = VideoCodec.features(moving, 8)
    assert(fs(0) === 3.0f && fs(1) === 0.75f)
    assert(fs(3) === 0.0f, "identical frames → zero motion")
    assert(fm(3) > 0.0f, "changing frames → positive motion")
    assert(VideoCodec.features(Array[Byte](9, 9), 8).forall(_ == 0.0f))
  }

  test("GDM0: motion-compensated pan round-trips losslessly and beats plain delta") {
    val mc = VideoCodec.synthesizePanAvi(11L, 32, 24, 6, keyEvery = 3, fps = 4,
      motion = true)
    val plain = VideoCodec.synthesizePanAvi(11L, 32, 24, 6, keyEvery = 3, fps = 4,
      motion = false)
    val dMc = VideoCodec.decodeFrames(mc)
    val dPlain = VideoCodec.decodeFrames(plain)
    assert(dMc.map(_._1) === (0 until 6))
    dMc.zip(dPlain).foreach { case ((f, got), (_, want)) =>
      assert(pixels(got) === pixels(want), s"frame $f must decode identically")
    }
    // the vector earns real bytes on panning content
    assert(mc.length * 3 < plain.length * 2,
      s"motion compensation must compress the pan: ${mc.length} vs ${plain.length}")
  }

  test("GDM0: static-scene content falls back to plain deltas byte-for-byte") {
    // marching-square frames (static background): best vector is (0,0),
    // so motion=true must emit the identical GDD0 stream
    val plain = VideoCodec.synthesizeDeltaAvi(5L, 32, 24, 6, keyEvery = 3, fps = 4)
    val frames = VideoCodec.decodeFrames(plain).map(_._2)
    val reMc = VideoCodec.encodeDeltaAvi(frames, fps = 4, keyEvery = 3, motion = true)
    val rePlain = VideoCodec.encodeDeltaAvi(frames, fps = 4, keyEvery = 3)
    assert(java.util.Arrays.equals(reMc, rePlain),
      "no-motion content must not pay for vectors")
  }

  test("GDM0: deltaMotion reads the residual - exactly the 5-column wrap seam") {
    val mc = VideoCodec.synthesizePanAvi(3L, 32, 24, 5, keyEvery = 3, fps = 4,
      motion = true)
    val motion = VideoCodec.deltaMotion(mc)
    // keys at 0 and 3; delta frames 1, 2, 4 each write seam-only
    // residual: <= 24 rows x 5 px x 3 bytes = 360 (a seam pixel whose
    // value happens to be 0 matches the black prediction and can glue
    // into the adjacent skip run, shaving a few bytes), and far below
    // the 2304-byte raster a plain delta rewrites
    assert(motion.map(_._1).toSet === Set(1, 2, 4))
    motion.foreach { case (f, bytes) =>
      assert(bytes <= 360L && bytes >= 300L,
        s"frame $f residual must be seam-sized, got $bytes")
    }
  }
}
