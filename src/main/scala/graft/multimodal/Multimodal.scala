package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns plus typed metadata, processed with
  * iterator-to-iterator `mapPartitions` over typed Datasets — the
  * Scala-native analog of Python's `mapInPandas` batch UDFs.
  *
  * Codec status: all three modalities are REAL and JDK-only. IMAGES —
  * [[ImageCodec]] decodes, resizes and feature-extracts PNG/JPEG/GIF/
  * BMP via `javax.imageio`. AUDIO — [[AudioCodec]] decodes WAV/AIFF PCM
  * via `javax.sound.sampled`. VIDEO — [[VideoCodec]] parses the AVI
  * (RIFF) container and decodes uncompressed BI_RGB and MJPEG frames
  * (MJPEG through the JDK's JPEG reader). Only inter-frame codecs
  * (H.264/VP9 in MP4) remain behind [[StubCodec]] — no pure-JVM decoder
  * exists; swap that one object for a javacv/ffmpeg binding in a real
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

  /** Real image codec on the JDK's `javax.imageio` — no external
    * dependency, headless-safe (BufferedImage rasters never touch a
    * display). Deterministic: pixel math only, and the PNG encoder
    * writes no timestamps. Undecodable bytes yield None/empty — a
    * 100 TB corpus always carries some corrupt assets, and one bad file
    * must not kill a stage. */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    /** (width, height) of the encoded image, if decodable. */
    def dimensions(bytes: Array[Byte]): Option[(Int, Int)] =
      decode(bytes).map(img => (img.getWidth, img.getHeight))

    /** Real resize: decode → bilinear-draw onto a w×h raster → PNG. */
    def resizePng(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decode(bytes).map { img =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        bos.toByteArray
      }

    /** 64-bit average hash (aHash) for perceptual image near-dup
      * detection: an 8×8 nearest-neighbor luma grid (source pixel
      * (gx·w/8, gy·h/8)), integer luma (299r+587g+114b)/1000, bit =
      * luma > floor(mean). Integer-exact end to end — any engine can
      * reproduce the hash from the pixel values alone (no float
      * interpolation, unlike the bilinear [[resizePng]] path), which is
      * what lets m2 sit under the DuckDB hash gate. Returns the 64-char
      * row-major bit string and its popcount. */
    /** The 8×8 nearest-neighbor integer-luma grid [[aHash64]] thresholds
      * — row-major, 64 values — exposed directly as an all-integer image
      * embedding (exact-arithmetic distances, oracle-reproducible). */
    def lumaGrid64(bytes: Array[Byte]): Option[Array[Long]] =
      decode(bytes).map(lumaGridOf)

    /** The 8×8 NN luma grid of an already-decoded raster — shared by the
      * image aHash and the per-FRAME video fingerprints. */
    private[multimodal] def lumaGridOf(img: BufferedImage): Array[Long] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val lumas = new Array[Long](64)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          val rgb = img.getRGB(gx * w / 8, gy * h / 8)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          lumas(gy * 8 + gx) = (299L * r + 587L * g + 114L * b) / 1000L
          gx += 1
        }
        gy += 1
      }
      lumas
    }

    private[multimodal] def aHashOf(img: BufferedImage): (String, Long) = {
      val lumas = lumaGridOf(img)
      val mean = lumas.sum / 64
      (lumas.map(l => if (l > mean) '1' else '0').mkString,
        lumas.count(_ > mean).toLong)
    }

    def aHash64(bytes: Array[Byte]): Option[(String, Long)] =
      decode(bytes).map(aHashOf)

    /** Real pixel features: [meanR, meanG, meanB, meanLuma, aspect] ++
      * a 16-bin normalized luminance histogram, truncated/zero-padded to
      * `dims`. All values in [0, 1] except aspect (w/h). */
    def pixelFeatures(bytes: Array[Byte], dims: Int): Array[Float] =
      decode(bytes) match {
        case None => Array.empty[Float]
        case Some(img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb, sl) = (0.0, 0.0, 0.0, 0.0)
          val hist = new Array[Float](16)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              val luma = 0.299 * r + 0.587 * g + 0.114 * b
              sr += r; sg += g; sb += b; sl += luma
              hist(math.min(15, (luma / 16).toInt)) += 1f
              x += 1
            }
            y += 1
          }
          val n = (w * h).toFloat
          val base = Array(
            (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
            (sb / n / 255.0).toFloat, (sl / n / 255.0).toFloat,
            w.toFloat / h.toFloat) ++ hist.map(_ / n)
          java.util.Arrays.copyOf(base, dims)
      }
  }

  /** Real audio codec on the JDK's `javax.sound.sampled` — WAV/AIFF PCM
    * decode with zero added dependencies. Deterministic sample math;
    * undecodable bytes yield None/empty like [[ImageCodec]]. */
  object AudioCodec {
    import javax.sound.sampled.AudioSystem

    final case class AudioInfo(
        sampleRateHz: Int, channels: Int, frames: Long, durationMs: Long)

    /** Decode to 16-bit samples (first channel) + stream info. */
    def decode(bytes: Array[Byte]): Option[(AudioInfo, Array[Short])] =
      try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val info = AudioInfo(
            fmt.getSampleRate.toInt, fmt.getChannels, frames,
            (frames * 1000L / math.max(1, fmt.getSampleRate.toInt)))
          val data = in.readAllBytes()
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val frameSize = fmt.getFrameSize
          val n = (data.length / frameSize).toInt
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            val off = i * frameSize // first channel only
            out(i) =
              if (bytesPerSample == 2) {
                if (fmt.isBigEndian)
                  (((data(off) & 0xff) << 8) | (data(off + 1) & 0xff)).toShort
                else
                  (((data(off + 1) & 0xff) << 8) | (data(off) & 0xff)).toShort
              } else ((data(off) & 0xff) - 128 << 8).toShort // 8-bit unsigned
            i += 1
          }
          Some((info, out))
        } finally in.close()
      } catch { case _: Exception => None }

    /** Real audio features: [rms, zero-crossing rate, peak, duration_s]
      * zero-padded/truncated to `dims`; [] when undecodable. */
    def features(bytes: Array[Byte], dims: Int): Array[Float] =
      decode(bytes) match {
        case None => Array.empty[Float]
        case Some((info, samples)) =>
          if (samples.isEmpty) java.util.Arrays.copyOf(new Array[Float](4), dims)
          else {
            var sumSq = 0.0
            var zc = 0
            var peak = 0
            var i = 0
            while (i < samples.length) {
              val s = samples(i).toInt
              sumSq += s.toDouble * s
              if (math.abs(s) > peak) peak = math.abs(s)
              if (i > 0 && ((s >= 0) != (samples(i - 1) >= 0))) zc += 1
              i += 1
            }
            val base = Array(
              (math.sqrt(sumSq / samples.length) / 32768.0).toFloat,
              zc.toFloat / samples.length,
              peak / 32768.0f,
              info.durationMs / 1000.0f)
            java.util.Arrays.copyOf(base, dims)
          }
      }

    /** Deterministic real PCM WAV: mono 16-bit sine at `hz`. */
    def synthesizeWav(hz: Double, ms: Int, sampleRate: Int = 8000): Array[Byte] = {
      val n = sampleRate * ms / 1000
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = (math.sin(2 * math.Pi * hz * i / sampleRate) * 16384).toInt.toShort
        i += 1
      }
      encodeWav(samples, sampleRate)
    }

    /** Re-encode raw 16-bit mono PCM as a WAV container — the write half
      * [[decode]] reverses (synthesis and any transform share it). */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Real VIDEO codec for the AVI (RIFF) container — pure JVM, zero
    * added dependencies, like the image/audio codecs. Two frame
    * encodings:
    *
    *   - `00db` uncompressed BI_RGB 24-bit DIB frames (bottom-up BGR
    *     rows, 4-byte-aligned) — LOSSLESS, so decoded pixels are
    *     analytically predictable and the video decode path sits under
    *     the same exact-integer oracle gate as images (m1/m10);
    *   - `00dc` MJPEG frames, decoded per frame through `javax.imageio`
    *     (the JDK ships a JPEG reader) — the compressed real-world
    *     variant, spec-verified for dimensional/structural agreement.
    *
    * This is a CONTAINER parser + frame codec, not a general-purpose
    * video stack: inter-frame codecs (H.264/VP9/AV1) have no pure-JVM
    * decoder in this environment and still require an external binding
    * ([[StubCodec]] remains the documented fallback for unknown
    * containers/codecs). Malformed bytes yield None/empty — corrupt
    * assets must never kill a stage. */
  object VideoCodec {
    import java.awt.image.BufferedImage
    import java.nio.{ByteBuffer, ByteOrder}

    final case class VideoInfo(w: Int, h: Int, nFrames: Int, usPerFrame: Long) {
      def durationMs: Long = nFrames.toLong * usPerFrame / 1000L
    }

    private def fourcc(s: String): Int =
      (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
    private val RIFF = fourcc("RIFF"); private val AVI = fourcc("AVI ")
    private val LIST = fourcc("LIST"); private val HDRL = fourcc("hdrl")
    private val AVIH = fourcc("avih"); private val MOVI = fourcc("movi")
    private val STRL = fourcc("strl"); private val STRH = fourcc("strh")
    private val STRF = fourcc("strf"); private val IDX1 = fourcc("idx1")

    private def rowBytes(w: Int) = ((w * 3 + 3) / 4) * 4

    /** Encode frames as an uncompressed BI_RGB AVI. All frames must
      * share the first frame's dimensions. */
    def encodeAvi(frames: Seq[BufferedImage], fps: Int): Array[Byte] = {
      require(frames.nonEmpty && fps > 0, "need at least one frame and fps > 0")
      val (w, h) = (frames.head.getWidth, frames.head.getHeight)
      require(frames.forall(f => f.getWidth == w && f.getHeight == h),
        "all frames must share dimensions")
      val rb = rowBytes(w)
      val frameBytes = rb * h
      val n = frames.size
      val moviContent = 4 + n * (8 + frameBytes)
      val hdrlContent = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val total = 12 + (8 + hdrlContent) + (8 + moviContent) + (8 + 16 * n)
      val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(RIFF).putInt(total - 8).putInt(AVI)
      // hdrl
      buf.putInt(LIST).putInt(hdrlContent).putInt(HDRL)
      buf.putInt(AVIH).putInt(56)
      buf.putInt((1000000L / fps).toInt) // µs per frame
        .putInt(0).putInt(0).putInt(0x10) // maxBytesPerSec, padding, AVIF_HASINDEX
        .putInt(n).putInt(0).putInt(1).putInt(frameBytes)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      buf.putInt(LIST).putInt(4 + (8 + 56) + (8 + 40)).putInt(STRL)
      buf.putInt(STRH).putInt(56)
      buf.putInt(fourcc("vids")).putInt(fourcc("DIB "))
        .putInt(0).putInt(0) // flags, prio+lang
        .putInt(0).putInt(1).putInt(fps).putInt(0).putInt(n) // init, scale, rate, start, length
        .putInt(frameBytes).putInt(0).putInt(0) // bufSize, quality, sampleSize
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      buf.putInt(STRF).putInt(40)
      buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
      // movi: 00db frames, BGR rows bottom-up, rows padded to 4 bytes
      buf.putInt(LIST).putInt(moviContent).putInt(MOVI)
      val moviFourccPos = 12 + (8 + hdrlContent) + 8 // position of the 'movi' fourcc
      val offsets = frames.map { img =>
        val off = buf.position() - moviFourccPos // idx1 offsets count from 'movi'
        buf.putInt(fourcc("00db")).putInt(frameBytes)
        var y = h - 1
        while (y >= 0) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            buf.put((rgb & 0xff).toByte)          // B
            buf.put(((rgb >> 8) & 0xff).toByte)   // G
            buf.put(((rgb >> 16) & 0xff).toByte)  // R
            x += 1
          }
          var pad = rb - w * 3
          while (pad > 0) { buf.put(0.toByte); pad -= 1 }
          y -= 1
        }
        off
      }
      buf.putInt(IDX1).putInt(16 * n)
      offsets.foreach { off =>
        buf.putInt(fourcc("00db")).putInt(0x10).putInt(off).putInt(frameBytes)
      }
      buf.array()
    }

    /** Per-frame JPEG encode with explicit quality (the MJPEG payload).
      * ImageIO's JPEG writer is deterministic for a fixed raster. */
    private def jpegBytes(img: BufferedImage, quality: Float): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      } finally { ios.close(); writer.dispose() }
      bos.toByteArray
    }

    /** Encode frames as an MJPEG AVI — the first genuinely COMPRESSED
      * video format in the codec stack, with zero new dependencies:
      * every `00dc` chunk is a standalone JPEG the JDK both writes
      * (here) and reads ([[decodeFrames]]' `dc` branch). Container
      * layout mirrors [[encodeAvi]] with `MJPG` as the stream handler
      * and biCompression, and variable-size chunks (JPEG) instead of
      * fixed-size DIBs. */
    def encodeMjpegAvi(
        frames: Seq[BufferedImage], fps: Int, quality: Float = 0.9f): Array[Byte] = {
      require(frames.nonEmpty && fps > 0, "need at least one frame and fps > 0")
      val (w, h) = (frames.head.getWidth, frames.head.getHeight)
      require(frames.forall(f => f.getWidth == w && f.getHeight == h),
        "all frames must share dimensions")
      val jpegs = frames.map(jpegBytes(_, quality))
      val n = frames.size
      val padded = jpegs.map(j => j.length + (j.length & 1)) // chunks even-align
      val maxChunk = jpegs.map(_.length).max
      val moviContent = 4 + padded.map(8 + _).sum
      val hdrlContent = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val total = 12 + (8 + hdrlContent) + (8 + moviContent) + (8 + 16 * n)
      val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(RIFF).putInt(total - 8).putInt(AVI)
      buf.putInt(LIST).putInt(hdrlContent).putInt(HDRL)
      buf.putInt(AVIH).putInt(56)
      buf.putInt((1000000L / fps).toInt) // µs per frame
        .putInt(0).putInt(0).putInt(0x10) // maxBytesPerSec, padding, AVIF_HASINDEX
        .putInt(n).putInt(0).putInt(1).putInt(maxChunk)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      buf.putInt(LIST).putInt(4 + (8 + 56) + (8 + 40)).putInt(STRL)
      buf.putInt(STRH).putInt(56)
      buf.putInt(fourcc("vids")).putInt(fourcc("MJPG"))
        .putInt(0).putInt(0) // flags, prio+lang
        .putInt(0).putInt(1).putInt(fps).putInt(0).putInt(n) // init, scale, rate, start, length
        .putInt(maxChunk).putInt(0).putInt(0) // bufSize, quality, sampleSize
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      buf.putInt(STRF).putInt(40)
      buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(fourcc("MJPG")).putInt(maxChunk).putInt(0).putInt(0).putInt(0).putInt(0)
      buf.putInt(LIST).putInt(moviContent).putInt(MOVI)
      val moviFourccPos = 12 + (8 + hdrlContent) + 8
      val offsets = jpegs.map { j =>
        val off = buf.position() - moviFourccPos
        buf.putInt(fourcc("00dc")).putInt(j.length)
        buf.put(j)
        if ((j.length & 1) == 1) buf.put(0.toByte)
        off
      }
      buf.putInt(IDX1).putInt(16 * n)
      offsets.zip(jpegs).foreach { case (off, j) =>
        buf.putInt(fourcc("00dc")).putInt(0x10).putInt(off).putInt(j.length)
      }
      buf.array()
    }

    /** Deterministic MJPEG AVI: `nFrames` SOLID-GRAY frames, gray value
      * `(seed*31 + f*19) % 200 + 28` per frame f. Solid gray survives
      * JPEG exactly at this quality (R=G=B ⇒ chroma 128 exactly; a
      * constant block is DC-only and the DC step at q=0.9 preserves the
      * used values — pinned by MultimodalSpec), so per-frame mean luma
      * is analytically reproducible from the formula — the m12 gate. */
    def synthesizeMjpegAvi(
        seed: Long, w: Int, h: Int, nFrames: Int, fps: Int): Array[Byte] = {
      val frames = (0 until nFrames).map { f =>
        val g = ((seed * 31 + f * 19) % 200 + 28).toInt
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        img
      }
      encodeMjpegAvi(frames, fps)
    }

    // ---- GDLT: an ORIGINAL temporal-delta codec (keyframe + RLE frame
    // diffs inside the same RIFF/AVI container) — the pure-JVM stand-in
    // for inter-frame compression (H.264/VP9 have no sandbox decoder):
    // frames AFTER a keyframe carry only the byte spans that CHANGED
    // versus the previous decoded frame, so decode is genuinely
    // temporal — a delta chunk is meaningless without its predecessor
    // chain, exactly the property that distinguishes inter-frame
    // formats from MJPEG's independent stills. Chunk payload (LE):
    //   int32 magic 'GDK0' + w·h·3 raw top-down RGB     (keyframe)
    //   int32 magic 'GDD0' + ops: {0x00 skip | 0x01 write} int32 len
    //     [len bytes for write]                          (delta)
    // Lossless by construction, so every downstream audit (luma sums,
    // aHash, shot detection) is bit-identical to the BI_RGB encoding
    // of the same frames — MultimodalSpec pins it. ----
    private val GDK0 = fourcc("GDK0"); private val GDD0 = fourcc("GDD0")
    // GDM0 = MOTION-COMPENSATED delta (m16): int32 magic + int32 dx +
    // int32 dy, then GDD0-style ops applied against the PREDICTED frame
    // prev translated by (dx, dy) — the panning-scene case where a
    // plain byte diff rewrites the whole raster but a global motion
    // vector plus a seam residual is a few hundred bytes. Original
    // format, same predecessor-chain decode contract as GDD0.
    private val GDM0 = fourcc("GDM0")
    private val MinSkipRun = 8 // a skip op costs 5 bytes; shorter equal
                               // runs are cheaper glued into the write

    private def rawRgb(img: BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      var i = 0; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(i) = ((rgb >> 16) & 0xff).toByte
          out(i + 1) = ((rgb >> 8) & 0xff).toByte
          out(i + 2) = (rgb & 0xff).toByte
          i += 3; x += 1
        }
        y += 1
      }
      out
    }

    private def imageOfRaw(raw: Array[Byte], w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var i = 0; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, ((raw(i) & 0xff) << 16) | ((raw(i + 1) & 0xff) << 8)
            | (raw(i + 2) & 0xff))
          i += 3; x += 1
        }
        y += 1
      }
      img
    }

    private def deltaOps(prev: Array[Byte], cur: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def putInt(v: Int): Unit = {
        bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
      }
      // raw equal/differ segments, then short equal runs glue into the
      // surrounding write (op overhead beats re-writing a few bytes)
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Int, Int)]
      val n = cur.length
      var i = 0
      while (i < n) {
        var j = i
        val eq = prev(i) == cur(i)
        if (eq) while (j < n && prev(j) == cur(j)) j += 1
        else while (j < n && prev(j) != cur(j)) j += 1
        val keepSkip = eq && (j - i >= MinSkipRun || j == n)
        segs.lastOption match {
          case Some((false, ps, _)) if !keepSkip =>
            segs(segs.size - 1) = (false, ps, j)
          case _ => segs += ((keepSkip, i, j))
        }
        i = j
      }
      segs.foreach { case (isSkip, s, e) =>
        if (isSkip) { bos.write(0x00); putInt(e - s) }
        else { bos.write(0x01); putInt(e - s); bos.write(cur, s, e - s) }
      }
      bos.toByteArray
    }

    private def applyDeltaOps(prev: Array[Byte], buf: ByteBuffer): Option[Array[Byte]] = {
      val out = prev.clone()
      var pos = 0
      while (buf.remaining >= 5) {
        val op = buf.get(); val len = buf.getInt()
        if (len < 0 || pos + len > out.length) return None
        if (op == 0x00) pos += len
        else if (op == 0x01) {
          if (buf.remaining < len) return None
          buf.get(out, pos, len); pos += len
        } else return None
      }
      if (pos == out.length) Some(out) else None
    }

    /** The motion-predicted raster: prev translated by (dx, dy) —
      * predicted(x, y) = prev(x − dx, y − dy) where in bounds, 0 (black)
      * at the uncovered seam. Shared by the GDM0 encoder and decoder:
      * they can never disagree on the prediction. */
    private def mcPredict(
        prev: Array[Byte], w: Int, h: Int, dx: Int, dy: Int): Array[Byte] = {
      val out = new Array[Byte](prev.length)
      var y = 0
      while (y < h) {
        val sy = y - dy
        if (sy >= 0 && sy < h) {
          // the in-bounds x span [x0, x1) maps to one contiguous copy
          val x0 = math.max(0, dx); val x1 = math.min(w, w + dx)
          if (x1 > x0)
            System.arraycopy(prev, (sy * w + (x0 - dx)) * 3,
              out, (y * w + x0) * 3, (x1 - x0) * 3)
        }
        y += 1
      }
      out
    }

    /** Deterministic global-translation search: argmax over a small
      * window of the SAMPLED pixel agreement between cur and
      * prev-translated-by-(dx, dy); first strict improvement in (dy,
      * dx) scan order wins, so the result is reproducible. Sampling
      * every 3rd pixel per axis keeps the 105-candidate search ~12× the
      * cost of one full-frame diff. */
    private def mcSearch(
        prev: Array[Byte], cur: Array[Byte], w: Int, h: Int): (Int, Int) = {
      var best = (0, 0); var bestScore = -1L
      var dy = -3
      while (dy <= 3) {
        var dx = -7
        while (dx <= 7) {
          var score = 0L
          var y = 0
          while (y < h) {
            val sy = y - dy
            if (sy >= 0 && sy < h) {
              var x = math.max(0, dx)
              val xEnd = math.min(w, w + dx)
              while (x < xEnd) {
                val pi = (sy * w + (x - dx)) * 3; val ci = (y * w + x) * 3
                if (prev(pi) == cur(ci) && prev(pi + 1) == cur(ci + 1)
                    && prev(pi + 2) == cur(ci + 2)) score += 1
                x += 3
              }
            }
            y += 3
          }
          if (score > bestScore) { bestScore = score; best = (dx, dy) }
          dx += 1
        }
        dy += 1
      }
      best
    }

    /** Encode frames as a GDLT temporal-delta AVI: a raw keyframe every
      * `keyEvery` frames (decoder resync / seek points, like any GOP),
      * RLE byte-diff deltas between. All frames share dimensions. With
      * `motion = true` each delta frame additionally runs the global
      * translation search and emits a GDM0 motion-compensated chunk
      * (vector + seam residual) whenever that beats the plain diff —
      * static scenes fall back to GDD0 byte-for-byte. */
    def encodeDeltaAvi(
        frames: Seq[BufferedImage], fps: Int, keyEvery: Int = 8,
        motion: Boolean = false): Array[Byte] = {
      require(frames.nonEmpty && fps > 0 && keyEvery > 0,
        "need at least one frame, fps > 0, keyEvery > 0")
      val (w, h) = (frames.head.getWidth, frames.head.getHeight)
      require(frames.forall(f => f.getWidth == w && f.getHeight == h),
        "all frames must share dimensions")
      val raws = frames.map(rawRgb)
      val chunks = raws.zipWithIndex.map { case (raw, f) =>
        if (f % keyEvery == 0) {
          val b = ByteBuffer.allocate(4 + raw.length).order(ByteOrder.LITTLE_ENDIAN)
          b.putInt(GDK0).put(raw); b.array()
        } else {
          val ops = deltaOps(raws(f - 1), raw)
          val mc: Option[(Int, Int, Array[Byte])] =
            if (!motion) None
            else {
              val (dx, dy) = mcSearch(raws(f - 1), raw, w, h)
              if (dx == 0 && dy == 0) None
              else Some((dx, dy,
                deltaOps(mcPredict(raws(f - 1), w, h, dx, dy), raw)))
            }
          mc match {
            // the vector costs 8 bytes — it must pay for itself
            case Some((dx, dy, mops)) if mops.length + 8 < ops.length =>
              val b = ByteBuffer.allocate(12 + mops.length)
                .order(ByteOrder.LITTLE_ENDIAN)
              b.putInt(GDM0).putInt(dx).putInt(dy).put(mops); b.array()
            case _ =>
              val b = ByteBuffer.allocate(4 + ops.length)
                .order(ByteOrder.LITTLE_ENDIAN)
              b.putInt(GDD0).put(ops); b.array()
          }
        }
      }
      val n = frames.size
      val padded = chunks.map(c => c.length + (c.length & 1))
      val maxChunk = chunks.map(_.length).max
      val moviContent = 4 + padded.map(8 + _).sum
      val hdrlContent = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val total = 12 + (8 + hdrlContent) + (8 + moviContent) + (8 + 16 * n)
      val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(RIFF).putInt(total - 8).putInt(AVI)
      buf.putInt(LIST).putInt(hdrlContent).putInt(HDRL)
      buf.putInt(AVIH).putInt(56)
      buf.putInt((1000000L / fps).toInt)
        .putInt(0).putInt(0).putInt(0x10)
        .putInt(n).putInt(0).putInt(1).putInt(maxChunk)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      buf.putInt(LIST).putInt(4 + (8 + 56) + (8 + 40)).putInt(STRL)
      buf.putInt(STRH).putInt(56)
      buf.putInt(fourcc("vids")).putInt(fourcc("GDLT"))
        .putInt(0).putInt(0)
        .putInt(0).putInt(1).putInt(fps).putInt(0).putInt(n)
        .putInt(maxChunk).putInt(0).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      buf.putInt(STRF).putInt(40)
      buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(fourcc("GDLT")).putInt(maxChunk).putInt(0).putInt(0).putInt(0).putInt(0)
      buf.putInt(LIST).putInt(moviContent).putInt(MOVI)
      val moviFourccPos = 12 + (8 + hdrlContent) + 8
      val offsets = chunks.map { c =>
        val off = buf.position() - moviFourccPos
        buf.putInt(fourcc("00dc")).putInt(c.length)
        buf.put(c)
        if ((c.length & 1) == 1) buf.put(0.toByte)
        off
      }
      buf.putInt(IDX1).putInt(16 * n)
      offsets.zip(chunks).foreach { case (off, c) =>
        // keyframes carry AVIIF_KEYFRAME; deltas depend on their chain
        val flags = if ((ByteBuffer.wrap(c).order(ByteOrder.LITTLE_ENDIAN).getInt(0)) == GDK0) 0x10 else 0
        buf.putInt(fourcc("00dc")).putInt(flags).putInt(off).putInt(c.length)
      }
      buf.array()
    }

    /** Deterministic GDLT fixture: a static seed-derived gray gradient
      * background with a bright 4×4 square marching across it (x0 =
      * 3f mod (w−4), y0 = 2f mod (h−4), value 200 + seed mod 40) — the
      * temporally-redundant content inter-frame codecs exist for: only
      * the square's old and new cells differ between frames, so delta
      * chunks stay tiny while keyframes carry the full raster. Gray
      * (R=G=B) makes per-pixel luma exactly the pixel value — the m14
      * oracle replays every pixel analytically. */
    def synthesizeDeltaAvi(
        seed: Long, w: Int, h: Int, nFrames: Int, keyEvery: Int, fps: Int): Array[Byte] = {
      val sq = (200 + seed % 40).toInt
      val frames = (0 until nFrames).map { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val x0 = (f * 3) % (w - 4); val y0 = (f * 2) % (h - 4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v =
              if (x >= x0 && x < x0 + 4 && y >= y0 && y < y0 + 4) sq
              else ((seed + x * 7 + y * 13) % 96).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        img
      }
      encodeDeltaAvi(frames, fps, keyEvery)
    }

    /** Deterministic cut-scene GDLT fixture for MOTION analysis (m15):
      * a STATIC seed-derived gray gradient with a 4×4 bright square
      * jumping 8 px per frame (x0 = 8f mod (w−8), y rows 4–7), and the
      * gradient's x/y coefficients swapping at `cutAt` — so within a
      * scene each delta chunk rewrites exactly the square's old and new
      * cells (4 rows × two 12-byte spans = 96 write bytes; the 8-px
      * jump keeps every equal gap ≥ MinSkipRun, no glue), while the cut
      * frame rewrites the whole raster as ONE write (w·h·3 bytes: the
      * only equal pixels, x ≡ y mod 16, are isolated and glue away).
      * No per-frame brightness drift (unlike the aHash fixture): drift
      * would make every pixel change every frame and flatten the
      * byte-motion signal this fixture exists to separate. */
    def synthesizeCutDeltaAvi(
        seed: Long, w: Int, h: Int, nFrames: Int, cutAt: Int, fps: Int): Array[Byte] = {
      require(w >= 16 && h >= 8, "square lanes need w >= 16, h >= 8")
      val sq = (200 + seed % 40).toInt
      val frames = (0 until nFrames).map { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val x0 = (f * 8) % (w - 8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v =
              if (x >= x0 && x < x0 + 4 && y >= 4 && y < 8) sq
              else if (f < cutAt) ((seed + x * 7 + y * 13) % 96).toInt
              else ((seed + x * 13 + y * 7) % 96).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        img
      }
      encodeDeltaAvi(frames, fps, keyEvery = nFrames + 1) // one key, all deltas
    }

    /** Deterministic PANNING fixture for MOTION COMPENSATION (m16): a
      * seed-derived gray gradient that translates 5 px left per frame
      * with wraparound — v(x, y, f) = (seed + ((x + 5f) mod w)·7 +
      * y·13) mod 96. A plain byte diff rewrites essentially the whole
      * raster every frame (the gradient has no 5-px period), while the
      * (dx = −5, dy = 0) motion vector predicts everything except the
      * 5-column wrap seam — the content class inter-frame codecs grow
      * motion search FOR. Gray (R=G=B) keeps per-pixel luma analytic
      * for the m16 oracle; the x-shift permutes columns, so each
      * frame's luma SUM is replayable per frame from the formula.
      * `motion = false` encodes the same frames as plain GDLT — the
      * A/B that proves the vector, not the container, earns the
      * compression. */
    def synthesizePanAvi(
        seed: Long, w: Int, h: Int, nFrames: Int, keyEvery: Int, fps: Int,
        motion: Boolean): Array[Byte] = {
      val frames = (0 until nFrames).map { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((seed + ((x + 5 * f) % w) * 7 + y * 13) % 96).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        img
      }
      encodeDeltaAvi(frames, fps, keyEvery, motion)
    }

    /** MOTION ENERGY straight off the GDLT delta chunks — NO pixel
      * decode: each `GDD0` chunk's write-op lengths already say how
      * many bytes moved since the previous frame, so per-frame motion
      * is a container walk over op headers (5 bytes each), skipping
      * every payload. Returns (frame_no, write_bytes) for DELTA frames
      * only (keyframes advance the frame counter but carry no motion —
      * they are resync points, not observations). The scale argument
      * is the point: shot detection over a compressed corpus reads op
      * headers, never rasters — the decode cost the aHash path (m13)
      * pays per frame disappears. */
    def deltaMotion(bytes: Array[Byte]): Seq[(Int, Long)] =
      probe(bytes).map { _ =>
        try {
          val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          buf.position(12) // past RIFF header
          val out = Seq.newBuilder[(Int, Long)]
          var frameNo = 0
          while (buf.remaining >= 8) {
            val id = buf.getInt(); val sz = buf.getInt()
            if (id == LIST && buf.remaining >= 4) {
              val listType = buf.getInt()
              if (listType == MOVI) {
                val end = buf.position() + sz - 4
                while (buf.position() < end && buf.remaining >= 8) {
                  val cid = buf.getInt(); val csz = buf.getInt()
                  val p = buf.position()
                  val tag = Array((cid >> 16) & 0xff, (cid >> 24) & 0xff)
                    .map(_.toChar).mkString
                  if (tag == "dc" && csz >= 4 && buf.getInt(p) == GDK0)
                    frameNo += 1
                  else if (tag == "dc" && csz >= 4 &&
                      (buf.getInt(p) == GDD0 ||
                        (buf.getInt(p) == GDM0 && csz >= 12))) {
                    // GDM0 residual ops sit after the 8-byte vector —
                    // motion energy reads the RESIDUAL (what the vector
                    // could not explain), still zero pixel decode
                    val skip = if (buf.getInt(p) == GDD0) 4 else 12
                    val ops = ByteBuffer.wrap(bytes, p + skip, csz - skip)
                      .order(ByteOrder.LITTLE_ENDIAN)
                    var written = 0L
                    var ok = true
                    while (ok && ops.remaining >= 5) {
                      val op = ops.get(); val len = ops.getInt()
                      if (len < 0) ok = false
                      else if (op == 0x00) ()
                      else if (op == 0x01) {
                        if (ops.remaining < len) ok = false
                        else { written += len; ops.position(ops.position() + len) }
                      } else ok = false
                    }
                    if (ok) out += frameNo -> written
                    frameNo += 1
                  } else if (tag == "dc" || tag == "db") frameNo += 1
                  buf.position(p + csz + (csz & 1))
                }
              } else buf.position(buf.position() + sz - 4 + (sz & 1))
            } else buf.position(buf.position() + sz + (sz & 1))
          }
          out.result()
        } catch { case _: Exception => Seq.empty }
      }.getOrElse(Seq.empty)

    /** Parse the container header: dimensions, frame count, frame
      * duration. None for anything that isn't a well-formed AVI. */
    def probe(bytes: Array[Byte]): Option[VideoInfo] =
      try {
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        if (buf.remaining < 24 || buf.getInt() != RIFF) return None
        buf.getInt() // riff size
        if (buf.getInt() != AVI) return None
        var info: Option[VideoInfo] = None
        while (buf.remaining >= 8 && info.isEmpty) {
          val id = buf.getInt(); val sz = buf.getInt()
          if (id == LIST && buf.remaining >= 4) {
            val listType = buf.getInt()
            if (listType == HDRL) {
              // scan the hdrl list for avih
              val end = buf.position() + sz - 4
              while (buf.position() < end && info.isEmpty) {
                val cid = buf.getInt(); val csz = buf.getInt()
                if (cid == AVIH && csz >= 40) {
                  val p = buf.position()
                  val usPerFrame = buf.getInt(p).toLong & 0xffffffffL
                  val nFrames = buf.getInt(p + 16)
                  val w = buf.getInt(p + 32); val h = buf.getInt(p + 36)
                  info = Some(VideoInfo(w, h, nFrames, usPerFrame))
                }
                buf.position(buf.position() + csz + (csz & 1))
              }
            } else buf.position(buf.position() + sz - 4 + (sz & 1))
          } else buf.position(buf.position() + sz + (sz & 1))
        }
        info.filter(i => i.w > 0 && i.h > 0 && i.nFrames >= 0)
      } catch { case _: Exception => None }

    /** Decode every frame: `(frame_no, image)` in stream order.
      * Supports `00db` BI_RGB, `00dc` MJPEG, and `00dc` GDLT
      * temporal-delta chunks (keyframe resets the predecessor state; a
      * delta applies to the PREVIOUS decoded frame — genuinely
      * inter-frame). Undecodable frames are skipped (corrupt-asset
      * tolerance); a delta with no decodable predecessor is dropped
      * rather than guessed. */
    def decodeFrames(bytes: Array[Byte]): Seq[(Int, BufferedImage)] =
      probe(bytes).map { info =>
        try {
          val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          buf.position(12)
          val out = Seq.newBuilder[(Int, BufferedImage)]
          var frameNo = 0
          var prevRaw: Array[Byte] = null // GDLT predecessor chain
          while (buf.remaining >= 8) {
            val id = buf.getInt(); val sz = buf.getInt()
            if (id == LIST && buf.remaining >= 4) {
              val listType = buf.getInt()
              if (listType == MOVI) {
                val end = buf.position() + sz - 4
                while (buf.position() < end && buf.remaining >= 8) {
                  val cid = buf.getInt(); val csz = buf.getInt()
                  val tag = Array((cid >> 16) & 0xff, (cid >> 24) & 0xff)
                    .map(_.toChar).mkString
                  val p = buf.position()
                  if (tag == "db") {
                    dibFrame(buf, p, csz, info.w, info.h)
                      .foreach(img => { out += frameNo -> img; frameNo += 1 })
                  } else if (tag == "dc" && csz >= 4 &&
                      (buf.getInt(p) == GDK0 || buf.getInt(p) == GDD0
                        || buf.getInt(p) == GDM0)) {
                    val rawLen = info.w * info.h * 3
                    val raw: Option[Array[Byte]] =
                      if (buf.getInt(p) == GDK0) {
                        if (csz - 4 != rawLen) None
                        else {
                          val a = new Array[Byte](rawLen)
                          buf.position(p + 4); buf.get(a); Some(a)
                        }
                      } else if (buf.getInt(p) == GDM0) {
                        // motion-compensated: rebuild the shared
                        // prediction, then apply the residual ops to it
                        if (prevRaw == null || csz < 12) None
                        else {
                          val dx = buf.getInt(p + 4); val dy = buf.getInt(p + 8)
                          if (math.abs(dx) >= info.w || math.abs(dy) >= info.h) None
                          else {
                            val ops = ByteBuffer.wrap(bytes, p + 12, csz - 12)
                              .order(ByteOrder.LITTLE_ENDIAN)
                            applyDeltaOps(
                              mcPredict(prevRaw, info.w, info.h, dx, dy), ops)
                          }
                        }
                      } else if (prevRaw != null) {
                        val ops = ByteBuffer.wrap(bytes, p + 4, csz - 4)
                          .order(ByteOrder.LITTLE_ENDIAN)
                        applyDeltaOps(prevRaw, ops)
                      } else None
                    raw match {
                      case Some(a) =>
                        prevRaw = a
                        out += frameNo -> imageOfRaw(a, info.w, info.h)
                        frameNo += 1
                      case None =>
                        // a failed key or delta BREAKS the predecessor
                        // chain: applying later deltas to the frame
                        // from two steps back would pass every length
                        // check and emit silently wrong pixels — drop
                        // the chain and re-anchor at the next keyframe
                        prevRaw = null
                    }
                  } else if (tag == "dc") {
                    val arr = new Array[Byte](csz)
                    buf.position(p); buf.get(arr)
                    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(arr)))
                      .foreach(img => { out += frameNo -> img; frameNo += 1 })
                  }
                  buf.position(p + csz + (csz & 1))
                }
              } else buf.position(buf.position() + sz - 4 + (sz & 1))
            } else buf.position(buf.position() + sz + (sz & 1))
          }
          out.result()
        } catch { case _: Exception => Seq.empty }
      }.getOrElse(Seq.empty)

    private def dibFrame(
        buf: ByteBuffer, pos: Int, size: Int, w: Int, h: Int): Option[BufferedImage] = {
      val rb = rowBytes(w)
      if (size < rb * h) None
      else {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          val rowStart = pos + (h - 1 - y) * rb // bottom-up rows
          var x = 0
          while (x < w) {
            val b = buf.get(rowStart + x * 3) & 0xff
            val g = buf.get(rowStart + x * 3 + 1) & 0xff
            val r = buf.get(rowStart + x * 3 + 2) & 0xff
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        Some(img)
      }
    }

    /** The frame covering timestamp `tsMs` (clamped to the last frame). */
    def frameAt(bytes: Array[Byte], tsMs: Long): Option[BufferedImage] =
      probe(bytes).flatMap { info =>
        if (info.nFrames == 0 || info.usPerFrame == 0) None
        else {
          val idx = math.min(tsMs * 1000 / info.usPerFrame, info.nFrames - 1L).toInt
          decodeFrames(bytes).collectFirst { case (n, img) if n == idx => img }
        }
      }

    /** Real decoded features: frame count, duration, mean luma, and
      * inter-frame MOTION (mean abs luma delta) — the shot-boundary /
      * static-asset signal. Zero-padded to `dims`. */
    def features(bytes: Array[Byte], dims: Int): Array[Float] = {
      val frames = decodeFrames(bytes)
      if (frames.isEmpty) return new Array[Float](dims)
      val info = probe(bytes).get
      val lumas = frames.map { case (_, img) =>
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            x += 1
          }
          y += 1
        }
        s.toDouble / (img.getWidth * img.getHeight)
      }
      val motion =
        if (lumas.size < 2) 0.0
        else lumas.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.sum / (lumas.size - 1)
      val base = Array(
        frames.size.toFloat,
        info.durationMs / 1000.0f,
        (lumas.sum / lumas.size / 255.0).toFloat,
        (motion / 255.0).toFloat)
      java.util.Arrays.copyOf(base, dims)
    }

    /** Deterministic real AVI: `nFrames` of a w×h per-frame gradient
      * derived from `seed` (frame term 19/23/29 per channel) — the video
      * analog of [[Multimodal.syntheticPng]], analytically reproducible
      * pixel by pixel. */
    def synthesizeAvi(seed: Long, w: Int, h: Int, nFrames: Int, fps: Int): Array[Byte] = {
      val frames = (0 until nFrames).map { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((seed * 31 + f * 19 + x * 7 + y * 13) % 256).toInt & 0xff
            val g = ((seed * 17 + f * 23 + x * 3 + y * 5) % 256).toInt & 0xff
            val b = ((seed * 7 + f * 29 + x * 11 + y * 2) % 256).toInt & 0xff
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        img
      }
      encodeAvi(frames, fps)
    }

    /** Synthesize an AVI containing a SCENE CUT: gray frames (R=G=B ⇒
      * luma IS the pixel value) whose spatial pattern swaps its x/y
      * coefficients at `cutAt` — a different gradient orientation, so
      * frame fingerprints flip hard at the boundary — while the
      * per-frame term is a small wrap-free brightness ramp (pattern ≤
      * 95 + 10·f ≤ 145 < 256), which shifts every pixel AND the frame
      * mean equally, leaving aHash bits EXACTLY stable inside a scene.
      * Pixel math only; m13's oracle replays both scenes analytically. */
    def synthesizeCutAvi(
        seed: Long, w: Int, h: Int, nFrames: Int, cutAt: Int, fps: Int): Array[Byte] = {
      val frames = (0 until nFrames).map { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p =
              if (f < cutAt) (seed + x * 7 + y * 13) % 96
              else (seed + x * 13 + y * 7) % 96
            val v = (p + f * 10).toInt & 0xff
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        img
      }
      encodeAvi(frames, fps)
    }
  }

  /** ======== STUB (unknown containers/codecs only) ========
    * Deterministic fake codec: derives "decoded" content from an md5 of
    * the bytes. Image ([[ImageCodec]]), audio ([[AudioCodec]]) and AVI
    * video ([[VideoCodec]]) are REAL, JDK-only; this fallback remains
    * for containers/codecs with no pure-JVM decoder (H.264/VP9 in MP4 —
    * swap in a javacv/ffmpeg binding in a deployment with native
    * libraries; all dataset-level operators below are codec-agnostic).
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
    * iterator per partition, codec state initialized once per task.
    * Images get REAL pixel features via [[ImageCodec]]; audio/video fall
    * back to the stub until a real A/V codec is plugged in. */
  def extractFeatures(ds: Dataset[MediaAsset], dims: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl detail: per-partition block so any heavier codec state
      // (readers, native contexts) initializes once per task
      it.map { a =>
        val feat = a.kind match {
          case "image" => ImageCodec.pixelFeatures(a.bytes, dims)
          case "audio" => AudioCodec.features(a.bytes, dims)
          case "video" if VideoCodec.probe(a.bytes).isDefined =>
            VideoCodec.features(a.bytes, dims)
          case _ => StubCodec.features(a.bytes, dims) // unknown container
        }
        MediaFeatures(a.asset_id, a.kind, a.bytes.length.toLong, feat)
      }
    }
  }

  /** Image resize: REAL decode + bilinear rescale + PNG re-encode via
    * [[ImageCodec]]; undecodable images and non-images pass through
    * unchanged. */
  def resizeImages(ds: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map {
        case a if a.kind == "image" =>
          ImageCodec.resizePng(a.bytes, w, h) match {
            case Some(resized) =>
              a.copy(bytes = resized,
                meta = a.meta.copy(mime = "image/png", width = w, height = h))
            case None => a // corrupt asset: pass through, don't kill the stage
          }
        case other => other
      }
    }
  }

  final case class TileStats(
      asset_id: Long, tile_x: Int, tile_y: Int, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Per-TILE channel statistics over a gx×gy crop grid — the patch
    * extraction every vision pipeline runs before per-patch embedding
    * (ViT patching, crop-level quality scores, region dedup). REAL
    * decode per image; pixel (x, y) lands in tile (x·gx/w, y·gy/h)
    * (integer division — the standard uneven-remainder grid), and each
    * tile reports its pixel count and exact per-channel integer sums.
    * One lazy iterator per partition, 1→gx·gy rows per asset; the
    * raster is visited once and never materialized as rows. Undecodable
    * images contribute nothing (corrupt assets must not kill a stage). */
  def tileStats(ds: Dataset[MediaAsset], gx: Int, gy: Int): Dataset[TileStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.filter(_.kind == "image").flatMap { a =>
        ImageCodec.decode(a.bytes) match {
          case None => Iterator.empty
          case Some(img) =>
            val w = img.getWidth
            val h = img.getHeight
            val nT = gx * gy
            val px = new Array[Long](nT)
            val sr = new Array[Long](nT)
            val sg = new Array[Long](nT)
            val sb = new Array[Long](nT)
            var y = 0
            while (y < h) {
              val ty = y * gy / h
              var x = 0
              while (x < w) {
                val t = ty * gx + x * gx / w
                val rgb = img.getRGB(x, y)
                px(t) += 1L
                sr(t) += (rgb >> 16) & 0xff
                sg(t) += (rgb >> 8) & 0xff
                sb(t) += rgb & 0xff
                x += 1
              }
              y += 1
            }
            (0 until nT).iterator.map(t =>
              TileStats(a.asset_id, t % gx, t / gx, px(t), sr(t), sg(t), sb(t)))
        }
      }
    }
  }

  /** Audio RESAMPLE by integer decimation (keep every `factor`-th
    * sample) + WAV re-encode — the rate-normalization every audio
    * training pipeline runs before batching (mixed-rate corpora can't
    * share a model input layer). Real decode → real re-encode; valid
    * when content sits below the new Nyquist rate (an anti-alias
    * low-pass belongs upstream for wideband content — decimation is the
    * plumbing under any polyphase kernel). Non-audio assets and
    * undecodable payloads pass through untouched. */
  def resampleAudio(ds: Dataset[MediaAsset], factor: Int): Dataset[MediaAsset] = {
    import ds.sparkSession.implicits._
    require(factor >= 1)
    ds.mapPartitions { it =>
      it.map {
        case a if a.kind == "audio" =>
          AudioCodec.decode(a.bytes) match {
            case Some((info, samples)) =>
              val kept = Array.tabulate(
                (samples.length + factor - 1) / factor)(j => samples(j * factor))
              val rate = info.sampleRateHz / factor
              a.copy(bytes = AudioCodec.encodeWav(kept, rate),
                meta = a.meta.copy(sampleRateHz = rate))
            case None => a // corrupt asset: pass through, don't kill the stage
          }
        case other => other
      }
    }
  }

  /** Probe real decoded dimensions into the metadata (images only) —
    * catches feeds whose declared metadata lies about the payload. */
  def probeImageDims(ds: Dataset[MediaAsset]): Dataset[MediaAsset] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map {
        case a if a.kind == "image" =>
          ImageCodec.dimensions(a.bytes) match {
            case Some((w, h)) => a.copy(meta = a.meta.copy(width = w, height = h))
            case None => a
          }
        case other => other
      }
    }
  }

  /** Frame sampling: one row per sampled frame every `everyMs` ms of the
    * asset's duration (videos only) — a lazy 1→N flatMap. AVI assets get
    * the REAL frame covering the timestamp, PNG-re-encoded (losslessly);
    * unknown containers fall back to the stub. */
  def sampleFrames(ds: Dataset[MediaAsset], everyMs: Long): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { a =>
      if (a.kind != "video") Iterator.empty
      else {
        val durationMs = VideoCodec.probe(a.bytes)
          .map(_.durationMs).getOrElse(a.meta.durationMs)
        if (durationMs <= 0) Iterator.empty
        else (0L until durationMs by everyMs).iterator.zipWithIndex.map {
          case (ts, i) =>
            val frame = VideoCodec.frameAt(a.bytes, ts) match {
              case Some(img) =>
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(img, "png", bos)
                bos.toByteArray
              case None => StubCodec.frameAt(a.bytes, ts)
            }
            Frame(a.asset_id, i, ts, frame)
        }
      }
    }
  }

  /** Exact-integer decode audit row — the oracle-gated face of the REAL
    * codecs. Every non-null value is an integer fact about the DECODED
    * payload (not its metadata), so a SQL oracle can recompute it
    * analytically from the synthesis formulas: decoded raster dims and
    * per-channel pixel sums for images, header fields plus zero-crossing
    * count and exact sample sum for audio. `payload_bytes` is null for
    * images because PNG length depends on deflate, which SQL can't
    * reproduce. */
  final case class MediaAudit(
      asset_id: Long, kind: String,
      img_w: Option[Long], img_h: Option[Long],
      sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long],
      sr_hz: Option[Long], frames: Option[Long], duration_ms: Option[Long],
      zcr: Option[Long], sample_sum: Option[Long], payload_bytes: Option[Long])

  private val noneAudit = MediaAudit(0L, "", None, None, None, None, None,
    None, None, None, None, None, None)

  /** Perceptual hash row (images only). */
  final case class MediaHash(asset_id: Long, ahash: String, n_ones: Long)

  /** aHash every decodable image asset ([[ImageCodec.aHash64]]) —
    * iterator-to-iterator mapPartitions (codec amortized per task);
    * non-images and undecodable payloads emit nothing. The hash column
    * is the multimodal dedup key: identical content → identical hash,
    * near-identical content → small Hamming distance. */
  def imageHashes(ds: Dataset[MediaAsset]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { a =>
        if (a.kind != "image") Iterator.empty
        else ImageCodec.aHash64(a.bytes).iterator
          .map { case (bits, ones) => MediaHash(a.asset_id, bits, ones) }
      }
    }
  }

  /** Integer image embedding: the 8×8 luma grid as a 64-dim vector. */
  final case class ImageEmb(asset_id: Long, emb: Seq[Long])

  /** Embed every decodable image as its 64-dim integer luma grid
    * ([[ImageCodec.lumaGrid64]]) — the multimodal→vector handoff: the
    * output column is exactly the shape the v-series similarity stack
    * consumes (replace with a learned encoder in production; the
    * plumbing — mapPartitions decode, per-task codec amortization,
    * pixels never shuffling — is identical). */
  def imageEmbeddings(ds: Dataset[MediaAsset]): Dataset[ImageEmb] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { a =>
        if (a.kind != "image") Iterator.empty
        else ImageCodec.lumaGrid64(a.bytes).iterator
          .map(g => ImageEmb(a.asset_id, g.toSeq))
      }
    }
  }

  final case class AudioPrefix(asset_id: Long, frames: Long, prefix: Seq[Long])

  /** Decoded PCM PREFIX (first `n` samples, long-widened) per decodable
    * AUDIO asset, plus total frame count — the trimmed-duplicate
    * detection primitive: two uploads of the same recording cut to
    * different lengths share a bit-identical prefix, so fingerprints of
    * the prefix bucket them regardless of duration. Same iterator-to-
    * iterator mapPartitions shape as [[audioEnergy]]; only n samples
    * (not the full PCM) leave the decode task. Assets shorter than `n`
    * are dropped (a shorter clip defines no length-n prefix). */
  def audioPrefixes(ds: Dataset[MediaAsset], n: Int): Dataset[AudioPrefix] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { a =>
        if (a.kind != "audio") Iterator.empty
        else AudioCodec.decode(a.bytes).iterator.collect {
          case (info, samples) if samples.length >= n =>
            AudioPrefix(a.asset_id, info.frames,
              samples.iterator.take(n).map(_.toLong).toIndexedSeq)
        }
      }
    }
  }

  /** One audio analysis frame: exact integer energy (Σ v²) over a
    * fixed-length sample window. */
  final case class AudioWindow(
      asset_id: Long, win: Int, n_samples: Long, energy: Long)

  /** Windowed energy contour over every decodable AUDIO asset — the
    * VAD/silence-detection/segmentation primitive: decode PCM with the
    * real `javax.sound` codec, then emit Σ v² per `frameSamples`-sample
    * window (all-integer: |v| ≤ 32768 → v² ≤ 2³⁰, a window sums far
    * below 2⁶³ — bit-reproducible by an analytic oracle). Iterator-to-
    * iterator mapPartitions like [[decodeAudit]]: the codec amortizes
    * per task, each asset expands to duration/frame rows (metadata-
    * sized), and the raw PCM never shuffles. */
  def audioEnergy(ds: Dataset[MediaAsset], frameSamples: Int): Dataset[AudioWindow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { a =>
        if (a.kind != "audio") Iterator.empty
        else AudioCodec.decode(a.bytes).iterator.flatMap { case (_, samples) =>
          samples.grouped(frameSamples).zipWithIndex.map { case (chunk, w) =>
            AudioWindow(a.asset_id, w, chunk.length.toLong,
              chunk.foldLeft(0L)((acc, v) => acc + v.toLong * v.toLong))
          }
        }
      }
    }
  }

  final case class AudioTone(asset_id: Long, probe_hz: Int, c: Long, s: Long)

  /** Single-bin DFT correlations at each probe frequency over every
    * decodable AUDIO asset — the pitch/tone-detection primitive (what a
    * dominant-frequency or DTMF detector computes): for probe f,
    * c = Σᵢ ⌊vᵢ·cos(2πfi/sr)·10⁶⌋ and s = Σᵢ ⌊vᵢ·sin(2πfi/sr)·10⁶⌋.
    * Each term is truncated to an integer BEFORE the sum, so the sums
    * are exact and order-independent — bit-reproducible by an analytic
    * oracle that mirrors the double-op order (`2*pi()*f*i/sr`, times v,
    * times 10⁶, trunc). |term| ≤ 32768·10⁶ and ≤ 2²⁰ samples keep the
    * sums far inside 2⁶³. Same iterator-to-iterator mapPartitions shape
    * as [[audioEnergy]]: K probe rows per asset leave the task, the PCM
    * never shuffles. */
  def audioTones(ds: Dataset[MediaAsset], probes: Seq[Int]): Dataset[AudioTone] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { a =>
        if (a.kind != "audio") Iterator.empty
        else AudioCodec.decode(a.bytes).iterator.flatMap { case (info, samples) =>
          probes.iterator.map { f =>
            var c = 0L; var s = 0L
            var i = 0
            while (i < samples.length) {
              val ang = 2 * math.Pi * f * i / info.sampleRateHz
              val v = samples(i).toDouble
              c += (v * math.cos(ang) * 1000000d).toLong
              s += (v * math.sin(ang) * 1000000d).toLong
              i += 1
            }
            AudioTone(a.asset_id, f, c, s)
          }
        }
      }
    }
  }

  /** Decode every asset with the real codecs and emit exact-integer
    * evidence of what was decoded (see [[MediaAudit]]). Same
    * iterator-to-iterator `mapPartitions` shape as [[extractFeatures]]. */
  def decodeAudit(ds: Dataset[MediaAsset]): Dataset[MediaAudit] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { a =>
        val base = noneAudit.copy(asset_id = a.asset_id, kind = a.kind)
        a.kind match {
          case "image" =>
            ImageCodec.decode(a.bytes) match {
              case Some(img) =>
                val (w, h) = (img.getWidth, img.getHeight)
                var (sr, sg, sb) = (0L, 0L, 0L)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    sr += (rgb >> 16) & 0xff
                    sg += (rgb >> 8) & 0xff
                    sb += rgb & 0xff
                    x += 1
                  }
                  y += 1
                }
                base.copy(img_w = Some(w.toLong), img_h = Some(h.toLong),
                  sum_r = Some(sr), sum_g = Some(sg), sum_b = Some(sb))
              case None => base
            }
          case "audio" =>
            AudioCodec.decode(a.bytes) match {
              case Some((info, samples)) =>
                var sum = 0L
                var zc = 0L
                var i = 0
                while (i < samples.length) {
                  sum += samples(i)
                  if (i > 0 && ((samples(i) >= 0) != (samples(i - 1) >= 0))) zc += 1
                  i += 1
                }
                base.copy(sr_hz = Some(info.sampleRateHz.toLong),
                  frames = Some(info.frames), duration_ms = Some(info.durationMs),
                  zcr = Some(zc), sample_sum = Some(sum),
                  payload_bytes = Some(a.bytes.length.toLong))
              case None => base
            }
          case "video" =>
            VideoCodec.probe(a.bytes) match {
              case Some(info) =>
                // exact-integer facts about the DECODED frames: dims,
                // frame count, duration, and per-channel pixel sums over
                // ALL frames (lossless BI_RGB ⇒ analytically gateable)
                var (sr, sg, sb) = (0L, 0L, 0L)
                VideoCodec.decodeFrames(a.bytes).foreach { case (_, img) =>
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      val rgb = img.getRGB(x, y)
                      sr += (rgb >> 16) & 0xff
                      sg += (rgb >> 8) & 0xff
                      sb += rgb & 0xff
                      x += 1
                    }
                    y += 1
                  }
                }
                base.copy(img_w = Some(info.w.toLong), img_h = Some(info.h.toLong),
                  sum_r = Some(sr), sum_g = Some(sg), sum_b = Some(sb),
                  frames = Some(info.nFrames.toLong),
                  duration_ms = Some(info.durationMs),
                  payload_bytes = Some(a.bytes.length.toLong))
              case None => // unknown container: only the length is observable
                base.copy(payload_bytes = Some(a.bytes.length.toLong))
            }
          case _ => // opaque: only the payload length is observable
            base.copy(payload_bytes = Some(a.bytes.length.toLong))
        }
      }
    }
  }

  final case class VideoFrameAudit(
      asset_id: Long, frame_no: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Per-FRAME exact-integer decode audit (videos only): one row per
    * decoded frame with channel pixel sums — the frame-level analog of
    * [[decodeAudit]], and the op a frame-dedup/shot-boundary pipeline
    * runs first. Lazy 1→N flatMap; a whole video's frames never
    * co-reside in memory beyond the codec's single in-flight frame. */
  def videoFrameAudit(ds: Dataset[MediaAsset]): Dataset[VideoFrameAudit] = {
    import ds.sparkSession.implicits._
    ds.flatMap { a =>
      if (a.kind != "video") Iterator.empty
      else VideoCodec.decodeFrames(a.bytes).iterator.map { case (f, img) =>
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        VideoFrameAudit(a.asset_id, f, sr, sg, sb)
      }
    }
  }

  final case class MjpegFrameAudit(
      asset_id: Long, frame_no: Int, w: Int, h: Int, sum_luma: Long)

  /** Per-FRAME integer-luma audit for COMPRESSED (MJPEG or GDLT
    * temporal-delta) videos: one row per decoded frame with dimensions
    * and the exact integer luma sum Σ (299r+587g+114b)/1000 over the
    * raster. For the solid-gray [[VideoCodec.synthesizeMjpegAvi]]
    * fixtures the decoded luma is analytically predictable (solid gray
    * survives the JPEG round trip exactly — MultimodalSpec pins it);
    * GDLT is lossless outright, so [[VideoCodec.synthesizeDeltaAvi]]'s
    * gray rasters replay pixel-exact (m14). Both sit under the same
    * exact-integer oracle gate as the lossless m10 path. Same lazy
    * 1→N decode shape: 3 ints + a long leave per frame. */
  def mjpegFrameAudit(ds: Dataset[MediaAsset]): Dataset[MjpegFrameAudit] = {
    import ds.sparkSession.implicits._
    ds.flatMap { a =>
      if (a.kind != "video") Iterator.empty
      else VideoCodec.decodeFrames(a.bytes).iterator.map { case (f, img) =>
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            s += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            x += 1
          }
          y += 1
        }
        MjpegFrameAudit(a.asset_id, f, img.getWidth, img.getHeight, s)
      }
    }
  }

  /** Synthesize a deterministic MJPEG-only media table — the fixture
    * set for the compressed-video gate (m12). */
  def synthesizeMjpeg(spark: SparkSession, ids: Seq[Long]): Dataset[MediaAsset] = {
    import spark.implicits._
    ids.map { id =>
      val nF = 2 + (id % 4).toInt
      val bytes = VideoCodec.synthesizeMjpegAvi(id, w = 32, h = 24, nFrames = nF, fps = 4)
      MediaAsset(id, "video", bytes, MediaMeta("video/x-msvideo", 32, 24, 0, nF * 250L))
    }.toDS()
  }

  /** Synthesize a deterministic GDLT (temporal-delta) media table — the
    * m14 fixture set: 5–7 frames of the marching-square raster at
    * 32×24, keyframe every 3 frames so decode crosses a mid-stream
    * resync point on every asset. */
  def synthesizeDeltaVideos(spark: SparkSession, ids: Seq[Long]): Dataset[MediaAsset] = {
    import spark.implicits._
    ids.map { id =>
      val nF = 5 + (id % 3).toInt
      val bytes = VideoCodec.synthesizeDeltaAvi(
        id, w = 32, h = 24, nFrames = nF, keyEvery = 3, fps = 4)
      MediaAsset(id, "video", bytes, MediaMeta("video/x-msvideo", 32, 24, 0, nF * 250L))
    }.toDS()
  }

  /** Deterministic cut-scene GDLT (temporal-delta) media table — the
    * m15 motion fixture: 6 frames at 32×24, one keyframe then all
    * deltas, scene boundary at frame 2 + id % 3. */
  def synthesizeCutDeltaVideos(spark: SparkSession, ids: Seq[Long]): Dataset[MediaAsset] = {
    import spark.implicits._
    ids.map { id =>
      val bytes = VideoCodec.synthesizeCutDeltaAvi(
        id, w = 32, h = 24, nFrames = 6, cutAt = 2 + (id % 3).toInt, fps = 4)
      MediaAsset(id, "video", bytes, MediaMeta("video/x-msvideo", 32, 24, 0, 1500L))
    }.toDS()
  }

  /** Deterministic PANNING media table — the m16 motion-compensation
    * fixture: 5–7 frames of the wrap-panning gradient at 32×24,
    * keyframe every 3 frames (decode crosses a mid-stream resync with
    * GDM0 chunks on both sides), encoded WITH motion search. */
  def synthesizeMcVideos(spark: SparkSession, ids: Seq[Long]): Dataset[MediaAsset] = {
    import spark.implicits._
    ids.map { id =>
      val nF = 5 + (id % 3).toInt
      val bytes = VideoCodec.synthesizePanAvi(
        id, w = 32, h = 24, nFrames = nF, keyEvery = 3, fps = 4, motion = true)
      MediaAsset(id, "video", bytes, MediaMeta("video/x-msvideo", 32, 24, 0, nF * 250L))
    }.toDS()
  }

  final case class GdltMotionAudit(asset_id: Long, frame_no: Int, motion_bytes: Long)

  /** Per-frame MOTION ENERGY from the delta chunks alone (videos only)
    * — op headers are read, rasters never decoded: the cheap first-pass
    * signal for shot detection / highlight sampling over an inter-frame
    * corpus. Same lazy per-partition shape as [[videoFrameHashes]];
    * 12 bytes leave per delta frame. */
  def gdltMotionAudit(ds: Dataset[MediaAsset]): Dataset[GdltMotionAudit] = {
    import ds.sparkSession.implicits._
    ds.flatMap { a =>
      if (a.kind != "video") Iterator.empty
      else VideoCodec.deltaMotion(a.bytes).iterator.map { case (f, m) =>
        GdltMotionAudit(a.asset_id, f, m)
      }
    }
  }

  final case class VideoFrameHash(asset_id: Long, frame_no: Int, ahash: String)

  /** Per-FRAME perceptual hashes (videos only): the video FINGERPRINT —
    * one 64-bit aHash per decoded frame, the representation video
    * near-dup detection joins on (re-uploads share every aligned frame
    * hash; trimmed cuts share the common prefix). Same lazy decode
    * shape as [[videoFrameAudit]]: 8 bytes leave per frame, pixels
    * never shuffle. */
  def videoFrameHashes(ds: Dataset[MediaAsset]): Dataset[VideoFrameHash] = {
    import ds.sparkSession.implicits._
    ds.flatMap { a =>
      if (a.kind != "video") Iterator.empty
      else VideoCodec.decodeFrames(a.bytes).iterator.map { case (f, img) =>
        VideoFrameHash(a.asset_id, f, ImageCodec.aHashOf(img)._1)
      }
    }
  }

  /** Deterministic real PNG: a w×h gradient raster derived from `seed`.
    * Pixel math only — no timestamps, no randomness — so the same seed
    * always encodes the same image. */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 31 + x * 7 + y * 13) % 256).toInt & 0xff
        val g = ((seed * 17 + x * 3 + y * 5) % 256).toInt & 0xff
        val b = ((seed * 7 + x * 11 + y * 2) % 256).toInt & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 6-frame cut-scene AVIs (every id is a video): scene
    * boundary at frame 2 + id % 3 — the m13 shot-detection fixture. */
  def synthesizeCutVideos(spark: SparkSession, ids: Seq[Long]): Dataset[MediaAsset] = {
    import spark.implicits._
    ids.map { id =>
      val bytes = VideoCodec.synthesizeCutAvi(
        id, w = 16, h = 12, nFrames = 6, cutAt = 2 + (id % 3).toInt, fps = 4)
      MediaAsset(id, "video", bytes, MediaMeta("video/x-msvideo", 16, 12, 0, 1500L))
    }.toDS()
  }

  /** Synthesize a deterministic media table from ids — test and demo
    * input without real media files. All three kinds carry REAL encoded
    * payloads: PNGs ([[ImageCodec]]), PCM WAVs ([[AudioCodec]]), and
    * BI_RGB AVIs ([[VideoCodec]] — 16×12, 2 + id%3 frames at 4 fps). */
  def synthesize(spark: SparkSession, ids: Seq[Long]): Dataset[MediaAsset] = {
    import spark.implicits._
    ids.map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      kind match {
        case "image" =>
          val (w, h) = (16 + (id % 4).toInt * 4, 12 + (id % 3).toInt * 4)
          MediaAsset(id, kind, syntheticPng(id, w, h),
            MediaMeta("image/png", w, h, 0, 0L))
        case "audio" =>
          val ms = (200 + (id % 5) * 100).toInt
          val bytes = AudioCodec.synthesizeWav(220.0 + (id % 8) * 55.0, ms)
          MediaAsset(id, kind, bytes, MediaMeta("audio/wav", 0, 0, 8000, ms.toLong))
        case _ =>
          val nFrames = 2 + ((id / 3) % 3).toInt // video ids are ≡2 mod 3; vary on id/3
          val bytes = VideoCodec.synthesizeAvi(id, w = 16, h = 12, nFrames = nFrames, fps = 4)
          MediaAsset(id, kind, bytes,
            MediaMeta("video/x-msvideo", 16, 12, 0, nFrames * 250L))
      }
    }.toDS()
  }
}
