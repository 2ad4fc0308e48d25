package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.multimodal.Multimodal

/** Oracle-gated multimodal coverage (SURVEY §2: multimodal columns).
  *
  * The registered query decodes a deterministic synthesized media table
  * (real PNGs via `javax.imageio`, real PCM WAVs via `javax.sound`) with
  * the REAL codecs and emits exact-integer facts about the decoded
  * payloads; the DuckDB oracle recomputes those facts analytically from
  * the synthesis formulas (`Multimodal.synthesize`) with generate_series
  * pixel/sample grids — fully independent of the JVM codecs. A decode
  * regression (wrong raster, wrong endianness, wrong header parse)
  * hash-mismatches immediately.
  *
  * Sample math parity: Scala builds samples as
  * `(math.sin(2*Pi*hz*i/8000) * 16384).toInt` — the oracle mirrors the
  * exact double-op order (`sin(2*pi()*hz*i/8000)`) and truncation
  * (`trunc`, not round), so both engines quantize identical doubles.
  */
object Media {

  val m1MediaFeatures = QueryDef.sql(
    "m1_media_features",
    """WITH ids AS (SELECT id FROM generate_series(0,59) t(id)),
      |img AS (SELECT id, 16 + (id%4)*4 AS w, 12 + (id%3)*4 AS h FROM ids WHERE id%3=0),
      |px AS (
      |  SELECT i.id,
      |    sum((i.id*31 + 7*xs.x + 13*ys.y) % 256) AS sum_r,
      |    sum((i.id*17 + 3*xs.x + 5*ys.y) % 256) AS sum_g,
      |    sum((i.id*7 + 11*xs.x + 2*ys.y) % 256) AS sum_b
      |  FROM img i, generate_series(0,27) xs(x), generate_series(0,11) ys(y)
      |  WHERE xs.x < i.w AND ys.y < i.h
      |  GROUP BY i.id),
      |aud AS (SELECT id, 220 + (id%8)*55 AS hz, 200 + (id%5)*100 AS ms FROM ids WHERE id%3=1),
      |smp AS (
      |  SELECT a.id, gs.i,
      |    CAST(trunc(sin(2*pi()*a.hz*gs.i/8000) * 16384) AS BIGINT) AS v
      |  FROM aud a, generate_series(0,4799) gs(i) WHERE gs.i < 8*a.ms),
      |lagd AS (SELECT id, i, v, lag(v) OVER (PARTITION BY id ORDER BY i) AS prev FROM smp),
      |astats AS (
      |  SELECT id, count(*) AS frames, sum(v) AS sample_sum,
      |    sum(CASE WHEN i>0 AND ((v>=0) != (prev>=0)) THEN 1 ELSE 0 END) AS zcr
      |  FROM lagd GROUP BY id),
      |vid AS (SELECT id, 2 + ((id//3) % 3) AS nf FROM ids WHERE id%3=2),
      |vpx AS (
      |  SELECT v.id,
      |    sum((v.id*31 + 19*fs.f + 7*xs.x + 13*ys.y) % 256) AS sum_r,
      |    sum((v.id*17 + 23*fs.f + 3*xs.x + 5*ys.y) % 256) AS sum_g,
      |    sum((v.id*7 + 29*fs.f + 11*xs.x + 2*ys.y) % 256) AS sum_b
      |  FROM vid v, generate_series(0,3) fs(f),
      |       generate_series(0,15) xs(x), generate_series(0,11) ys(y)
      |  WHERE fs.f < v.nf
      |  GROUP BY v.id)
      |SELECT i.id AS asset_id, 'image' AS kind, i.w AS img_w, i.h AS img_h,
      |  p.sum_r, p.sum_g, p.sum_b,
      |  NULL AS sr_hz, NULL AS frames, NULL AS duration_ms,
      |  NULL AS zcr, NULL AS sample_sum, NULL AS payload_bytes
      |FROM img i JOIN px p ON i.id = p.id
      |UNION ALL
      |SELECT a.id, 'audio', NULL, NULL, NULL, NULL, NULL,
      |  8000, s.frames, a.ms, s.zcr, s.sample_sum, 44 + 2*s.frames
      |FROM aud a JOIN astats s ON a.id = s.id
      |UNION ALL
      |-- video: REAL AVI decode facts — dims, all-frame channel sums,
      |-- frame count, duration, and the exact container size
      |-- (232 header/index bytes + 600 per 16×12 BI_RGB frame chunk)
      |SELECT v.id, 'video', 16, 12, p.sum_r, p.sum_g, p.sum_b,
      |  NULL, v.nf, 250*v.nf, NULL, NULL, 232 + 600*v.nf
      |FROM vid v JOIN vpx p ON v.id = p.id""".stripMargin) { (s, _) =>
    Multimodal.decodeAudit(
      Multimodal.repartitionForDecode(Multimodal.synthesize(s, 0L until 60L), 8))
      .toDF()
  }

  // --- m2_image_phash: perceptual average-hash over the REAL decoded
  // PNGs — the multimodal dedup key (identical content → identical
  // hash, near-identical → small Hamming distance). The codec samples
  // an 8×8 nearest-neighbor luma grid and thresholds against the
  // integer mean (ImageCodec.aHash64 — all-integer, no float
  // interpolation), so the oracle reproduces every bit analytically
  // from the synthesis pixel formulas: decode → NN sample → integer
  // luma → mean threshold is gated end to end. Scale shape: one
  // mapPartitions decode pass (codec amortized per task), output is
  // 8 bytes/asset — the corpus's floats/pixels never shuffle. ---
  val m2ImagePhash = QueryDef.sql(
    "m2_image_phash",
    """WITH ids AS (SELECT id FROM generate_series(0,59) t(id)),
      |img AS (SELECT id, 16 + (id%4)*4 AS w, 12 + (id%3)*4 AS h FROM ids WHERE id%3=0),
      |cells AS (SELECT i.id, gy.y AS gy, gx.x AS gx,
      |    (i.id*31 + 7*((gx.x*i.w)//8) + 13*((gy.y*i.h)//8)) % 256 AS r,
      |    (i.id*17 + 3*((gx.x*i.w)//8) + 5*((gy.y*i.h)//8)) % 256 AS g,
      |    (i.id*7 + 11*((gx.x*i.w)//8) + 2*((gy.y*i.h)//8)) % 256 AS b
      |  FROM img i, generate_series(0,7) gx(x), generate_series(0,7) gy(y)),
      |lum AS (SELECT id, gy, gx, (299*r + 587*g + 114*b)//1000 AS l FROM cells),
      |m AS (SELECT id, sum(l)//64 AS mean FROM lum GROUP BY id),
      |bits AS (SELECT l.id, l.gy, l.gx,
      |    CASE WHEN l.l > m.mean THEN '1' ELSE '0' END AS bit
      |  FROM lum l JOIN m ON m.id = l.id)
      |SELECT id AS asset_id,
      |  string_agg(bit, '' ORDER BY gy, gx) AS ahash,
      |  CAST(sum(CASE WHEN bit = '1' THEN 1 ELSE 0 END) AS BIGINT) AS n_ones
      |FROM bits GROUP BY id""".stripMargin) { (s, _) =>
    Multimodal.imageHashes(
      Multimodal.repartitionForDecode(Multimodal.synthesize(s, 0L until 60L), 8))
      .toDF()
  }

  // --- m3_audio_energy: windowed energy contour over the REAL decoded
  // PCM — the voice-activity/silence-detection primitive a training
  // pipeline runs before segmenting audio. 100 ms windows (800 samples
  // at 8 kHz), energy = Σ v² per window in exact integers; the oracle
  // regenerates every sample analytically (m1's sin/trunc parity) and
  // windows by i//800, so decode → frame split → energy is gated bit
  // for bit. Scale shape: mapPartitions decode (codec per task), each
  // asset emits duration/100ms rows — PCM bytes never shuffle. ---
  val m3AudioEnergy = QueryDef.sql(
    "m3_audio_energy",
    """WITH ids AS (SELECT id FROM generate_series(0,59) t(id)),
      |aud AS (SELECT id, 220 + (id%8)*55 AS hz, 200 + (id%5)*100 AS ms FROM ids WHERE id%3=1),
      |smp AS (
      |  SELECT a.id, gs.i,
      |    CAST(trunc(sin(2*pi()*a.hz*gs.i/8000) * 16384) AS BIGINT) AS v
      |  FROM aud a, generate_series(0,4799) gs(i) WHERE gs.i < 8*a.ms)
      |SELECT id AS asset_id, CAST(i//800 AS INTEGER) AS win,
      |  count(*) AS n_samples, CAST(sum(v*v) AS BIGINT) AS energy
      |FROM smp GROUP BY id, i//800""".stripMargin) { (s, _) =>
    Multimodal.audioEnergy(
      Multimodal.repartitionForDecode(Multimodal.synthesize(s, 0L until 60L), 8),
      frameSamples = 800)
      .toDF()
  }

  // --- m4_image_knn: multimodal → vector-search composition — decode
  // the REAL PNGs, embed each as its 64-dim integer luma grid
  // (Multimodal.imageEmbeddings: the m2 sampling grid as a vector
  // instead of a thresholded hash), and rank each image's 3 nearest
  // neighbors by EXACT integer squared-L2 (the codegen'd ArrayLongL2
  // kernel — no UDF, no interpreted HOF). The oracle rebuilds every grid analytically
  // from the synthesis formulas and pair-joins on cell coordinates, so
  // decode → embed → distance → rank is gated end to end. The 20-image
  // probe set pairs via a broadcast (the deliberate exact baseline, as
  // v1); a corpus-scale run hands the same embedding column to the
  // v2/v5 bucketed indexes — that path is already gated there. ---
  val m4ImageKnn = QueryDef.sql(
    "m4_image_knn",
    """WITH ids AS (SELECT id FROM generate_series(0,59) t(id)),
      |img AS (SELECT id, 16 + (id%4)*4 AS w, 12 + (id%3)*4 AS h FROM ids WHERE id%3=0),
      |cells AS (SELECT i.id, gy.y AS gy, gx.x AS gx,
      |    (i.id*31 + 7*((gx.x*i.w)//8) + 13*((gy.y*i.h)//8)) % 256 AS r,
      |    (i.id*17 + 3*((gx.x*i.w)//8) + 5*((gy.y*i.h)//8)) % 256 AS g,
      |    (i.id*7 + 11*((gx.x*i.w)//8) + 2*((gy.y*i.h)//8)) % 256 AS b
      |  FROM img i, generate_series(0,7) gx(x), generate_series(0,7) gy(y)),
      |lum AS (SELECT id, gy, gx, (299*r + 587*g + 114*b)//1000 AS l FROM cells),
      |pd AS (SELECT a.id AS qa, b.id AS nb,
      |    CAST(sum((a.l - b.l)*(a.l - b.l)) AS BIGINT) AS dist2
      |  FROM lum a JOIN lum b ON a.gy = b.gy AND a.gx = b.gx AND a.id != b.id
      |  GROUP BY qa, nb)
      |SELECT qa AS asset_id, nb AS neighbor_id, dist2, rank FROM (
      |  SELECT qa, nb, dist2,
      |    row_number() OVER (PARTITION BY qa ORDER BY dist2, nb) AS rank
      |  FROM pd) t
      |WHERE rank <= 3""".stripMargin) { (s, _) =>
    import org.apache.spark.sql.expressions.Window
    val emb = Multimodal.imageEmbeddings(
      Multimodal.repartitionForDecode(Multimodal.synthesize(s, 0L until 60L), 8))
      .toDF()
    val a = emb.select(col("asset_id").as("qa"), col("emb").as("ea"))
    val b = emb.select(col("asset_id").as("nb"), col("emb").as("eb"))
    val w = Window.partitionBy(col("qa")).orderBy(col("dist2"), col("nb"))
    a.crossJoin(broadcast(b)).filter(col("qa") =!= col("nb"))
      .withColumn("dist2",
        graft.functions.ArrayLongL2.l2Q(col("ea"), col("eb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qa").as("asset_id"), col("nb").as("neighbor_id"),
        col("dist2"), col("rank"))
  }

  // --- m5_audio_tone: dominant-frequency detection over the REAL
  // decoded PCM — single-bin DFT correlations at the 8 synthesis tones
  // (220 + 55k Hz), each c/s term truncated to an integer BEFORE the
  // exact sum (Multimodal.audioTones), then probes ranked per asset by
  // double power (identical expression shape both engines; the true
  // tone's bin dominates by orders of magnitude, so the ordering is
  // unambiguous). The oracle regenerates every sample analytically
  // (m1's sin/trunc parity) and recomputes all 8 correlations from the
  // formulas — decode → DFT → argmax is gated bit for bit, and rank 1
  // landing on the synthesized hz is the self-check. Scale shape: K
  // probe rows per asset leave the decode task (PCM never shuffles);
  // the rank window partitions by asset. ---
  val m5AudioTone = QueryDef.sql(
    "m5_audio_tone",
    """WITH ids AS (SELECT id FROM generate_series(0,59) t(id)),
      |aud AS (SELECT id, 220 + (id%8)*55 AS hz, 200 + (id%5)*100 AS ms FROM ids WHERE id%3=1),
      |smp AS (
      |  SELECT a.id, gs.i,
      |    CAST(trunc(sin(2*pi()*a.hz*gs.i/8000) * 16384) AS BIGINT) AS v
      |  FROM aud a, generate_series(0,4799) gs(i) WHERE gs.i < 8*a.ms),
      |probes AS (SELECT 220 + p.p*55 AS probe_hz FROM generate_series(0,7) p(p)),
      |corr AS (
      |  SELECT s.id, pr.probe_hz,
      |    CAST(sum(CAST(trunc(CAST(s.v AS DOUBLE) * cos(2*pi()*pr.probe_hz*s.i/8000) * 1000000) AS BIGINT)) AS BIGINT) AS c,
      |    CAST(sum(CAST(trunc(CAST(s.v AS DOUBLE) * sin(2*pi()*pr.probe_hz*s.i/8000) * 1000000) AS BIGINT)) AS BIGINT) AS s
      |  FROM smp s, probes pr GROUP BY s.id, pr.probe_hz)
      |SELECT id AS asset_id, probe_hz, c, s, rank FROM (
      |  SELECT id, probe_hz, c, s,
      |    row_number() OVER (PARTITION BY id ORDER BY
      |      (CAST(c AS DOUBLE)/1e6)*(CAST(c AS DOUBLE)/1e6) +
      |      (CAST(s AS DOUBLE)/1e6)*(CAST(s AS DOUBLE)/1e6) DESC, probe_hz) AS rank
      |  FROM corr) t""".stripMargin) { (s, _) =>
    import org.apache.spark.sql.expressions.Window
    val tones = Multimodal.audioTones(
      Multimodal.repartitionForDecode(Multimodal.synthesize(s, 0L until 60L), 8),
      probes = (0 until 8).map(220 + _ * 55))
      .toDF()
    val power =
      (col("c").cast("double") / lit(1e6)) * (col("c").cast("double") / lit(1e6)) +
        (col("s").cast("double") / lit(1e6)) * (col("s").cast("double") / lit(1e6))
    val w = Window.partitionBy(col("asset_id")).orderBy(power.desc, col("probe_hz"))
    tones.withColumn("rank", row_number().over(w))
      .select(col("asset_id"), col("probe_hz"), col("c"), col("s"), col("rank"))
  }

  // --- m6_image_neardup: perceptual near-dup detection — m2's hash
  // composed with d3's band-bucket discipline: split each 64-bit aHash
  // into 4×16-bit bands, equi-join on (band, key) for candidates, then
  // verify exact Hamming ≤ 3. 4 bands at t = 3 is PIGEONHOLE-COMPLETE
  // (3 differing bits can corrupt at most 3 bands, so one band always
  // matches) — the Spark-side banding provably loses nothing, which is
  // why the oracle can brute-force all pairs and still be an exact
  // gate, not a recall estimate. The asset set extends m2's corpus with
  // two variant ranges: +768 is the synthesis formula's full period
  // (pixel-identical re-encodes — Hamming 0, the classic re-upload
  // case) and +256 shifts only the channel phases (near-misses at
  // small Hamming). Scale shape: decode once (8 bytes/asset leave the
  // scan), one equi-join shuffle on band keys, HOF Hamming only on
  // candidates — never an all-pairs compare in Spark. ---
  val m6ImageNeardup = QueryDef.sql(
    "m6_image_neardup",
    """WITH ids AS (SELECT x AS id FROM generate_series(0,59) t(x)
      |            UNION ALL SELECT x + 256 FROM generate_series(0,59) t(x)
      |            UNION ALL SELECT x + 768 FROM generate_series(0,59) t(x)),
      |img AS (SELECT id, 16 + (id%4)*4 AS w, 12 + (id%3)*4 AS h FROM ids WHERE id%3=0),
      |cells AS (SELECT i.id, gy.y AS gy, gx.x AS gx,
      |    (i.id*31 + 7*((gx.x*i.w)//8) + 13*((gy.y*i.h)//8)) % 256 AS r,
      |    (i.id*17 + 3*((gx.x*i.w)//8) + 5*((gy.y*i.h)//8)) % 256 AS g,
      |    (i.id*7 + 11*((gx.x*i.w)//8) + 2*((gy.y*i.h)//8)) % 256 AS b
      |  FROM img i, generate_series(0,7) gx(x), generate_series(0,7) gy(y)),
      |lum AS (SELECT id, gy, gx, (299*r + 587*g + 114*b)//1000 AS l FROM cells),
      |m AS (SELECT id, sum(l)//64 AS mean FROM lum GROUP BY id),
      |bits AS (SELECT l.id, l.gy, l.gx,
      |    CASE WHEN l.l > m.mean THEN 1 ELSE 0 END AS bit
      |  FROM lum l JOIN m ON m.id = l.id),
      |h AS (SELECT a.id AS id_a, b.id AS id_b,
      |    CAST(sum(CASE WHEN a.bit != b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
      |  FROM bits a JOIN bits b ON a.gy = b.gy AND a.gx = b.gx AND a.id < b.id
      |  GROUP BY a.id, b.id)
      |SELECT id_a, id_b, hamming FROM h WHERE hamming <= 3""".stripMargin) { (s, _) =>
    val ids = (0L until 60L) ++ (256L until 316L) ++ (768L until 828L)
    val hs = Multimodal.imageHashes(
        Multimodal.repartitionForDecode(Multimodal.synthesize(s, ids), 8))
      .toDF().select(col("asset_id"), col("ahash"))
    val bands = hs.select(col("asset_id"), expr(
      "explode(transform(sequence(0, 3), " +
        "b -> struct(b AS band, substring(ahash, b*16 + 1, 16) AS key)))").as("p"))
      .select(col("asset_id"), col("p.band").as("band"), col("p.key").as("key"))
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "key"))
      .filter(col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("id_a"), col("y.asset_id").as("id_b"))
      .distinct()
    cand
      .join(hs.select(col("asset_id").as("id_a"), col("ahash").as("ha")), Seq("id_a"))
      .join(hs.select(col("asset_id").as("id_b"), col("ahash").as("hb")), Seq("id_b"))
      .withColumn("hamming", expr(
        "aggregate(transform(sequence(1, 64), " +
          "i -> CASE WHEN substring(ha, i, 1) = substring(hb, i, 1) THEN 0L ELSE 1L END), " +
          "0L, (acc, x) -> acc + x)"))
      .filter(col("hamming") <= 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // --- m7_audio_neardup: TRIMMED-duplicate detection over real decoded
  // PCM — the audio analog of m6's perceptual image near-dup: the same
  // recording uploaded at different cut lengths shares a bit-identical
  // sample PREFIX, so a fingerprint of the first 200 ms (1600 samples at
  // 8 kHz) buckets duplicates regardless of duration. Pipeline: decode
  // with the real javax.sound codec (mapPartitions — only the 1600-
  // sample prefix leaves the task, never the full PCM), fingerprint with
  // three EXACT integer functionals of the prefix (Σv, Σv·i, zero
  // crossings — order-fixed, overflow-bounded: |Σv·i| ≤ 16384·1600² <
  // 2³⁶), candidate pairs from an equi-join on the fingerprint triple,
  // then an exact sample-by-sample verify on CANDIDATES ONLY (zip_with
  // equality count = 1600) — never an all-pairs PCM compare. The oracle
  // derives ground truth analytically from the synthesis formulas: two
  // audio assets collide iff they share the synthesis tone, so any
  // fingerprint collision across tones or missed pair hash-mismatches.
  // All array math is codegen'd HOF expressions — no UDF. ---
  val m7AudioNeardup = QueryDef.sql(
    "m7_audio_neardup",
    """WITH ids AS (SELECT id FROM generate_series(0,59) t(id)),
      |aud AS (SELECT id, 220 + (id%8)*55 AS hz, 200 + (id%5)*100 AS ms
      |        FROM ids WHERE id%3=1)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(8*a.ms AS BIGINT) AS frames_a, CAST(8*b.ms AS BIGINT) AS frames_b,
      |  a.ms <> b.ms AS trimmed
      |FROM aud a JOIN aud b ON a.hz = b.hz AND a.id < b.id""".stripMargin) { (s, _) =>
    val pre = Multimodal.audioPrefixes(
      Multimodal.repartitionForDecode(Multimodal.synthesize(s, 0L until 60L), 8),
      n = 1600).toDF()
    val sig = pre.select(col("asset_id"), col("frames"),
      expr("aggregate(prefix, 0L, (a, x) -> a + x)").as("psum"),
      expr("aggregate(zip_with(prefix, sequence(1, 1600), (v, i) -> v * i), " +
        "0L, (a, x) -> a + x)").as("wsum"),
      expr("aggregate(transform(sequence(2, 1600), i -> CASE WHEN " +
        "(element_at(prefix, i) >= 0) = (element_at(prefix, i - 1) >= 0) " +
        "THEN 0L ELSE 1L END), 0L, (a, x) -> a + x)").as("zcr"))
    val a = sig.select(col("asset_id").as("id_a"), col("frames").as("frames_a"),
      col("psum"), col("wsum"), col("zcr"))
    val b = sig.select(col("asset_id").as("id_b"), col("frames").as("frames_b"),
      col("psum"), col("wsum"), col("zcr"))
    val cand = a.join(b, Seq("psum", "wsum", "zcr"))
      .filter(col("id_a") < col("id_b"))
    cand
      .join(pre.select(col("asset_id").as("id_a"), col("prefix").as("pa")), Seq("id_a"))
      .join(pre.select(col("asset_id").as("id_b"), col("prefix").as("pb")), Seq("id_b"))
      .withColumn("matched", expr(
        "aggregate(zip_with(pa, pb, (x, y) -> CASE WHEN x = y THEN 1L ELSE 0L END), " +
          "0L, (a, x) -> a + x)"))
      .filter(col("matched") === 1600)
      .select(col("id_a"), col("id_b"), col("frames_a"), col("frames_b"),
        (col("frames_a") =!= col("frames_b")).as("trimmed"))
  }

  // --- m8_image_tiles: per-TILE channel statistics over a 2×2 crop
  // grid of every REAL decoded image — the patch-extraction plumbing
  // (ViT patching, crop-level quality, region dedup) run as a 1→4
  // flatMap per asset with the raster visited once
  // (Multimodal.tileStats). Pixel (x, y) lands in tile
  // (x·2 div w, y·2 div h) — the standard uneven-remainder grid — and
  // each tile reports exact integer pixel count + per-channel sums.
  // The oracle recomputes every tile analytically from the synthesis
  // formulas on a generate_series pixel grid (m1's discipline,
  // codec-independent), so a raster-order bug, a channel swap, or an
  // off-by-one tile boundary hash-mismatches. ---
  val m8ImageTiles = QueryDef.sql(
    "m8_image_tiles",
    """WITH ids AS (SELECT id FROM generate_series(0,59) t(id)),
      |img AS (SELECT id, 16 + (id%4)*4 AS w, 12 + (id%3)*4 AS h FROM ids WHERE id%3=0),
      |px AS (
      |  SELECT i.id, (xs.x*2)//i.w AS tile_x, (ys.y*2)//i.h AS tile_y,
      |    CAST(count(*) AS BIGINT) AS n_px,
      |    CAST(sum((i.id*31 + 7*xs.x + 13*ys.y) % 256) AS BIGINT) AS sum_r,
      |    CAST(sum((i.id*17 + 3*xs.x + 5*ys.y) % 256) AS BIGINT) AS sum_g,
      |    CAST(sum((i.id*7 + 11*xs.x + 2*ys.y) % 256) AS BIGINT) AS sum_b
      |  FROM img i, generate_series(0,27) xs(x), generate_series(0,11) ys(y)
      |  WHERE xs.x < i.w AND ys.y < i.h
      |  GROUP BY 1, 2, 3)
      |SELECT id AS asset_id, CAST(tile_x AS INT) AS tile_x,
      |  CAST(tile_y AS INT) AS tile_y, n_px, sum_r, sum_g, sum_b
      |FROM px""".stripMargin) { (s, _) =>
    Multimodal.tileStats(
      Multimodal.repartitionForDecode(Multimodal.synthesize(s, 0L until 60L), 8),
      gx = 2, gy = 2)
      .toDF()
  }

  // --- m9_audio_resample: RESAMPLE (decimate ×2, 8 kHz → 4 kHz) + WAV
  // re-encode + re-decode, end to end — the rate-normalization plumbing
  // every mixed-rate audio corpus needs before batching. The gate runs
  // the full codec round trip (decode → keep every 2nd sample →
  // re-encode → decode AGAIN through decodeAudit), so a header-write
  // bug, an off-by-one in the kept-sample grid, or a rate-metadata lie
  // all surface; the oracle recomputes frames / sample sum / zero
  // crossings / payload size analytically over the DECIMATED synthesis
  // grid (i ≡ 0 mod 2), codec-independent (m1's discipline). Content
  // validity: the fixture tones top out at 605 Hz, far under the new
  // 2 kHz Nyquist (an anti-alias low-pass belongs upstream for
  // wideband content — documented on the operator). ---
  val m9AudioResample = QueryDef.sql(
    "m9_audio_resample",
    """WITH ids AS (SELECT id FROM generate_series(0,59) t(id)),
      |aud AS (SELECT id, 220 + (id%8)*55 AS hz, 200 + (id%5)*100 AS ms FROM ids WHERE id%3=1),
      |smp AS (
      |  SELECT a.id, gs.i//2 AS j,
      |    CAST(trunc(sin(2*pi()*a.hz*gs.i/8000) * 16384) AS BIGINT) AS v
      |  FROM aud a, generate_series(0,4799) gs(i)
      |  WHERE gs.i < 8*a.ms AND gs.i % 2 = 0),
      |lagd AS (SELECT id, j, v, lag(v) OVER (PARTITION BY id ORDER BY j) AS prev FROM smp),
      |astats AS (
      |  SELECT id, CAST(count(*) AS BIGINT) AS frames,
      |    CAST(sum(v) AS BIGINT) AS sample_sum,
      |    CAST(sum(CASE WHEN j>0 AND ((v>=0) != (prev>=0)) THEN 1 ELSE 0 END) AS BIGINT) AS zcr
      |  FROM lagd GROUP BY id)
      |SELECT a.id AS asset_id, CAST(4000 AS BIGINT) AS sr_hz, s.frames,
      |  CAST(a.ms AS BIGINT) AS duration_ms, s.zcr, s.sample_sum,
      |  CAST(44 + 2*s.frames AS BIGINT) AS payload_bytes
      |FROM aud a JOIN astats s ON s.id = a.id""".stripMargin) { (s, _) =>
    Multimodal.decodeAudit(
      Multimodal.resampleAudio(
        Multimodal.repartitionForDecode(Multimodal.synthesize(s, 0L until 60L), 8),
        factor = 2))
      .toDF()
      .filter(col("kind") === "audio")
      .select(col("asset_id"), col("sr_hz"), col("frames"), col("duration_ms"),
        col("zcr"), col("sample_sum"), col("payload_bytes"))
  }

  // --- m10_video_frames: REAL video decode under the hash gate — one
  // row per (asset, frame) with exact per-channel pixel sums over the
  // decoded raster. The synthesized assets are genuine AVI (RIFF)
  // containers with uncompressed BI_RGB frames (VideoCodec — container
  // parse, bottom-up BGR row decode, 4-byte row alignment all
  // exercised), and BI_RGB is lossless, so the oracle reproduces every
  // pixel analytically from the synthesis formula (frame term 19/23/29
  // per channel) exactly as m2 does for PNGs. A header-parse or raster
  // regression (wrong frame order, row direction, channel order,
  // padding) hash-mismatches immediately. Scale shape: lazy 1→N
  // per-partition decode, 3 longs per frame out — pixels never
  // shuffle. ---
  val m10VideoFrames = QueryDef.sql(
    "m10_video_frames",
    """WITH ids AS (SELECT id FROM generate_series(0,59) t(id)),
      |vid AS (SELECT id, 2 + ((id//3) % 3) AS nf FROM ids WHERE id%3=2),
      |fr AS (
      |  SELECT v.id, fs.f,
      |    CAST(sum((v.id*31 + 19*fs.f + 7*xs.x + 13*ys.y) % 256) AS BIGINT) AS sum_r,
      |    CAST(sum((v.id*17 + 23*fs.f + 3*xs.x + 5*ys.y) % 256) AS BIGINT) AS sum_g,
      |    CAST(sum((v.id*7 + 29*fs.f + 11*xs.x + 2*ys.y) % 256) AS BIGINT) AS sum_b
      |  FROM vid v, generate_series(0,3) fs(f),
      |       generate_series(0,15) xs(x), generate_series(0,11) ys(y)
      |  WHERE fs.f < v.nf
      |  GROUP BY v.id, fs.f)
      |SELECT id AS asset_id, f AS frame_no, sum_r, sum_g, sum_b
      |FROM fr""".stripMargin) { (s, _) =>
    Multimodal.videoFrameAudit(
      Multimodal.repartitionForDecode(Multimodal.synthesize(s, 0L until 60L), 8))
      .toDF()
  }

  // --- m11_video_neardup: VIDEO near-dup detection — the re-upload /
  // trimmed-cut case for video corpora, composing the real codec stack
  // end to end: decode frames (VideoCodec), fingerprint each frame with
  // the 8×8 aHash (ImageCodec's grid on the decoded raster), join on
  // the FRAME-0 hash for candidates (the keyframe/thumbnail key every
  // video dedup pipeline blocks on), then verify per aligned frame.
  // The corpus extends the base video set with +768 and +1536 id
  // shifts: 768 is the pixel formula's period (768·m ≡ 0 mod 256 for
  // every channel multiplier) so shifted videos replay IDENTICAL
  // per-frame pixels, but the frame COUNT varies with (id/3)%3 — i.e.
  // the same footage at different cut lengths, the trimmed-duplicate
  // shape m7 pins for audio. Output per candidate pair: aligned frame
  // count and total Hamming distance over aligned fingerprints (0 for
  // the planted family). The oracle replays grid, threshold, frame-0
  // join and per-frame compare analytically — accidental frame-0
  // collisions between unrelated videos appear identically on both
  // sides, so the gate is exact, not a recall estimate. Scale shape:
  // 8 bytes/frame leave the decode, candidates come from one equi-join
  // on the hash string, Hamming runs only on aligned candidate frames
  // — never all-pairs. ---
  val m11VideoNeardup = QueryDef.sql(
    "m11_video_neardup",
    """WITH ids AS (SELECT x AS id FROM generate_series(0,59) t(x)
      |            UNION ALL SELECT x + 768 FROM generate_series(0,59) t(x)
      |            UNION ALL SELECT x + 1536 FROM generate_series(0,59) t(x)),
      |vid AS (SELECT id, 2 + ((id//3) % 3) AS nf FROM ids WHERE id%3=2),
      |cells AS (SELECT v.id, fs.f, gy.y AS gy, gx.x AS gx,
      |    (v.id*31 + 19*fs.f + 7*(2*gx.x) + 13*((3*gy.y)//2)) % 256 AS r,
      |    (v.id*17 + 23*fs.f + 3*(2*gx.x) + 5*((3*gy.y)//2)) % 256 AS g,
      |    (v.id*7 + 29*fs.f + 11*(2*gx.x) + 2*((3*gy.y)//2)) % 256 AS b
      |  FROM vid v, generate_series(0,3) fs(f),
      |       generate_series(0,7) gx(x), generate_series(0,7) gy(y)
      |  WHERE fs.f < v.nf),
      |lum AS (SELECT id, f, gy, gx, (299*r + 587*g + 114*b)//1000 AS l FROM cells),
      |m AS (SELECT id, f, sum(l)//64 AS mean FROM lum GROUP BY id, f),
      |bits AS (SELECT l.id, l.f, l.gy, l.gx,
      |    CASE WHEN l.l > m.mean THEN 1 ELSE 0 END AS bit
      |  FROM lum l JOIN m ON m.id = l.id AND m.f = l.f),
      |h0 AS (SELECT id, string_agg(CAST(bit AS VARCHAR), '' ORDER BY gy, gx) AS hash
      |  FROM bits WHERE f = 0 GROUP BY id),
      |cand AS (SELECT a.id AS id_a, b.id AS id_b
      |  FROM h0 a JOIN h0 b ON a.hash = b.hash AND a.id < b.id),
      |alh AS (SELECT c.id_a, c.id_b,
      |    CAST(count(DISTINCT x.f) AS BIGINT) AS aligned_frames,
      |    CAST(sum(CASE WHEN x.bit != y.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
      |  FROM cand c
      |  JOIN bits x ON x.id = c.id_a
      |  JOIN bits y ON y.id = c.id_b AND y.f = x.f AND y.gy = x.gy AND y.gx = x.gx
      |  GROUP BY c.id_a, c.id_b)
      |SELECT id_a, id_b, aligned_frames, hamming FROM alh""".stripMargin) { (s, _) =>
    val ids = (0L until 60L) ++ (768L until 828L) ++ (1536L until 1596L)
    val fh = Multimodal.videoFrameHashes(
        Multimodal.repartitionForDecode(Multimodal.synthesize(s, ids), 8))
      .toDF()
    val f0 = fh.filter(col("frame_no") === 0).select(col("asset_id"), col("ahash"))
    val cand = f0.as("x").join(f0.as("y"), Seq("ahash"))
      .filter(col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("id_a"), col("y.asset_id").as("id_b"))
    cand
      .join(fh.select(col("asset_id").as("id_a"), col("frame_no"),
        col("ahash").as("ha")), Seq("id_a"))
      .join(fh.select(col("asset_id").as("id_b"), col("frame_no"),
        col("ahash").as("hb")), Seq("id_b", "frame_no"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("aligned_frames"),
        sum(expr(
          "size(filter(sequence(1, 64), i -> substring(ha, i, 1) != substring(hb, i, 1)))"
        ).cast("long")).as("hamming"))
      .select(col("id_a"), col("id_b"), col("aligned_frames"), col("hamming"))
  }

  // --- m12_mjpeg_frames: COMPRESSED video decode under the hash gate —
  // the first inter-opaque (JPEG-compressed) format in the codec stack,
  // zero new dependencies: every AVI `00dc` chunk is a standalone JPEG
  // the JDK writes (encodeMjpegAvi) and reads (decodeFrames). The
  // fixtures are SOLID-GRAY frames (gray = (id·31 + f·19) % 200 + 28):
  // R=G=B makes chroma exactly 128 and a constant raster is DC-only, so
  // the JPEG round trip returns the gray value EXACTLY (pinned by
  // MultimodalSpec across all 200 values) — which lifts a lossy codec
  // into the same exact-integer oracle discipline as the lossless m10
  // path: per-frame luma sums are recomputed analytically from the
  // synthesis formula. A container, chunk-alignment, or JPEG decode
  // regression hash-mismatches immediately. Scale shape: lazy 1→N
  // per-partition decode, 3 ints + 1 long per frame out. ---
  val m12MjpegFrames = QueryDef.sql(
    "m12_mjpeg_frames",
    """WITH ids AS (SELECT id FROM generate_series(0,47) t(id)),
      |vid AS (SELECT id, 2 + (id % 4) AS nf FROM ids),
      |fr AS (SELECT v.id, fs.f, ((v.id*31 + fs.f*19) % 200 + 28) AS g
      |  FROM vid v, generate_series(0,4) fs(f) WHERE fs.f < v.nf)
      |SELECT id AS asset_id, f AS frame_no, 32 AS w, 24 AS h,
      |  CAST(g * 32 * 24 AS BIGINT) AS sum_luma
      |FROM fr""".stripMargin) { (s, _) =>
    Multimodal.mjpegFrameAudit(
      Multimodal.repartitionForDecode(Multimodal.synthesizeMjpeg(s, 0L until 48L), 8))
      .toDF()
  }

  // --- m13_shot_boundaries: VIDEO CUT DETECTION — the shot-boundary
  // pass every video-corpus pipeline runs before sampling keyframes,
  // composed on the real codec stack: decode frames (VideoCodec),
  // fingerprint each with the 8×8 aHash (ImageCodec's grid), then flag
  // frames whose Hamming distance to the PREVIOUS frame crosses the
  // threshold. Fixtures are synthesized cut-scene AVIs (scene A's
  // gradient swaps its x/y coefficients at frame 2 + id % 3), so the
  // orientation flip moves the fingerprint hard at the boundary while
  // staying stable inside scenes; the oracle replays BOTH scenes'
  // pixels, the sampling grid, per-frame means, bits, and the
  // consecutive-frame compare analytically — exact gate, not a recall
  // estimate. Scale shape: 8 bytes/frame leave the decode; the
  // consecutive compare is a per-asset window over frame counts,
  // never a frame self-join. ---
  val m13ShotBoundaries = QueryDef.sql(
    "m13_shot_boundaries",
    """WITH ids AS (SELECT id FROM generate_series(0,39) t(id)),
      |vid AS (SELECT id, 2 + id % 3 AS cut FROM ids),
      |lum AS (SELECT v.id, fs.f, gy.y AS gy, gx.x AS gx,
      |    (CASE WHEN fs.f < v.cut
      |      THEN (v.id + 7*(2*gx.x) + 13*((3*gy.y)//2)) % 96
      |      ELSE (v.id + 13*(2*gx.x) + 7*((3*gy.y)//2)) % 96 END) + 10*fs.f AS l
      |  FROM vid v, generate_series(0,5) fs(f),
      |       generate_series(0,7) gx(x), generate_series(0,7) gy(y)),
      |m AS (SELECT id, f, sum(l)//64 AS mean FROM lum GROUP BY id, f),
      |bits AS (SELECT l.id, l.f, l.gy, l.gx,
      |    CASE WHEN l.l > m.mean THEN 1 ELSE 0 END AS bit
      |  FROM lum l JOIN m ON m.id = l.id AND m.f = l.f),
      |j AS (SELECT a.id, a.f,
      |    CAST(sum(CASE WHEN a.bit != b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
      |  FROM bits a JOIN bits b ON b.id = a.id AND b.f = a.f - 1
      |    AND b.gy = a.gy AND b.gx = a.gx
      |  GROUP BY a.id, a.f)
      |SELECT id AS asset_id, f AS frame_no, hamming, hamming >= 12 AS is_cut
      |FROM j""".stripMargin) { (s, _) =>
    import org.apache.spark.sql.expressions.Window
    val fh = Multimodal.videoFrameHashes(
        Multimodal.repartitionForDecode(Multimodal.synthesizeCutVideos(s, 0L until 40L), 8))
      .toDF()
    val w = Window.partitionBy(col("asset_id")).orderBy(col("frame_no"))
    fh.withColumn("ph", lag(col("ahash"), 1).over(w))
      .filter(col("ph").isNotNull)
      .withColumn("hamming", expr(
        "size(filter(sequence(1, 64), i -> substring(ahash, i, 1) != substring(ph, i, 1)))")
        .cast("long"))
      .select(col("asset_id"), col("frame_no"), col("hamming"),
        (col("hamming") >= 12).as("is_cut"))
  }

  // --- m14_delta_video: INTER-FRAME compressed video decode — the
  // temporal-delta codec (VideoCodec GDLT: raw keyframes + RLE byte
  // diffs vs the PREVIOUS decoded frame, inside the same RIFF/AVI
  // container) exercising the property H.264/VP9 have and MJPEG lacks:
  // a frame is only decodable through its predecessor chain. Fixtures
  // are marching-square rasters (static gray gradient + a bright 4×4
  // square moving 3px/2px per frame) — temporally redundant content, so
  // delta chunks carry only the square's old and new cells. keyEvery=3
  // puts a mid-stream resync point inside every asset (5–7 frames), so
  // decode crosses keyframe re-anchoring, not just one initial key.
  // GDLT is lossless, so per-frame luma sums replay pixel-exact from
  // the synthesis formula; `compressed` asserts every asset's payload
  // beats the BI_RGB equivalent of the same frames (nf × (8 + 96·24)
  // movi bytes) — the whole point of inter-frame coding. A chain,
  // resync, or RLE regression hash-mismatches. Scale shape unchanged:
  // lazy 1→N per-partition decode, 4 ints + a long per frame out. ---
  val m14DeltaVideo = QueryDef.sql(
    "m14_delta_video",
    """WITH ids AS (SELECT id FROM generate_series(0,39) t(id)),
      |vid AS (SELECT id, 5 + (id % 3) AS nf FROM ids),
      |px AS (SELECT v.id, fs.f,
      |    CASE WHEN gx.x >= (fs.f*3) % 28 AND gx.x < (fs.f*3) % 28 + 4
      |          AND gy.y >= (fs.f*2) % 20 AND gy.y < (fs.f*2) % 20 + 4
      |      THEN 200 + v.id % 40
      |      ELSE (v.id + gx.x*7 + gy.y*13) % 96 END AS l
      |  FROM vid v, generate_series(0,6) fs(f),
      |       generate_series(0,31) gx(x), generate_series(0,23) gy(y)
      |  WHERE fs.f < v.nf)
      |SELECT id AS asset_id, f AS frame_no, 32 AS w, 24 AS h,
      |  CAST(sum(l) AS BIGINT) AS sum_luma, TRUE AS compressed
      |FROM px GROUP BY id, f""".stripMargin) { (s, _) =>
    val assets = Multimodal.synthesizeDeltaVideos(s, 0L until 40L)
    val audit = Multimodal.mjpegFrameAudit(
      Multimodal.repartitionForDecode(assets, 8)).toDF()
    // compression evidence: the GDLT payload must beat the BI_RGB movi
    // bytes of the same frames — 8-byte chunk header + 96·24 raster each
    val comp = assets.toDF().select(col("asset_id"),
      (length(col("bytes")) < (col("meta.durationMs") / 250L) * 2312L)
        .as("compressed"))
    audit.join(comp, Seq("asset_id"))
      .select(col("asset_id"), col("frame_no"), col("w"), col("h"),
        col("sum_luma"), col("compressed"))
  }

  // --- m15_motion_shots: SHOT DETECTION FROM DELTA CHUNKS — the
  // inter-frame codec's payload IS a motion sensor: every GDLT delta
  // chunk's write-op lengths say how many bytes moved since the
  // previous frame, so motion energy (and the cut decision) comes from
  // a container walk over 5-byte op headers with ZERO pixel decode —
  // the decode cost m13's aHash path pays per frame disappears, which
  // at corpus scale is the difference between scanning op headers and
  // rasterizing every video. Fixtures are cut-scene GDLT AVIs built
  // for clean byte analytics (static gradient + a square jumping 8 px:
  // within-scene deltas write exactly 4 rows × two 12-byte spans = 96
  // bytes; the cut's coefficient swap rewrites the whole 2304-byte
  // raster as one glued write since the only equal pixels, x ≡ y mod
  // 16, are isolated), so the oracle states every frame's motion and
  // the cut flags analytically — an exact gate, not a recall estimate.
  // The threshold (half the raster) sits 12× above the in-scene signal
  // and 2× below the cut. ---
  val m15MotionShots = QueryDef.sql(
    "m15_motion_shots",
    """WITH ids AS (SELECT id FROM generate_series(0,39) t(id)),
      |vid AS (SELECT id, 2 + id % 3 AS cut FROM ids),
      |fr AS (SELECT v.id, fs.f, v.cut FROM vid v, generate_series(1,5) fs(f))
      |SELECT id AS asset_id, f AS frame_no,
      |  CAST(CASE WHEN f = cut THEN 2304 ELSE 96 END AS BIGINT) AS motion_bytes,
      |  f = cut AS is_cut
      |FROM fr""".stripMargin) { (s, _) =>
    val audit = Multimodal.gdltMotionAudit(
      Multimodal.repartitionForDecode(
        Multimodal.synthesizeCutDeltaVideos(s, 0L until 40L), 8)).toDF()
    val out = audit
      .withColumn("is_cut", col("motion_bytes") > lit(32L * 24L * 3L / 2L))
      .select(col("asset_id"), col("frame_no"), col("motion_bytes"), col("is_cut"))
    // non-vacuity: exactly one cut per asset, real in-scene motion rows
    val (cuts, calm) = {
      val r = out.agg(
        sum(when(col("is_cut"), 1L).otherwise(0L)),
        sum(when(!col("is_cut") && col("motion_bytes") > 0, 1L).otherwise(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    require(cuts == 40L && calm == 160L,
      s"motion gate must see one cut per asset over a moving scene: $cuts/$calm")
    out
  }

  // --- m16_mc_video: MOTION-COMPENSATED inter-frame decode — GDLT
  // grows the capability that separates real video codecs from plain
  // frame differencing: a GDM0 chunk carries a GLOBAL MOTION VECTOR
  // (found by deterministic translation search at encode) and only the
  // RESIDUAL the vector cannot explain, applied against the
  // motion-predicted previous frame (encoder and decoder share the
  // predictor, so they can never disagree). Fixtures are wrap-panning
  // gradients — the content class motion search exists for: a plain
  // byte diff rewrites the whole raster every frame (no 5-px period in
  // the gradient), the (−5, 0) vector predicts everything except the
  // 5-column wrap seam. keyEvery=3 puts a resync inside every asset
  // with GDM0 chunks on both sides. GDM0 is lossless like GDD0, so
  // per-frame luma sums replay pixel-exact from the synthesis formula
  // under the hash; the in-gate A/B re-encodes the SAME frames with
  // motion search off and require()s the MC payload under ⅔ of the
  // plain-delta payload on EVERY asset — the vector, not the
  // container, earns the compression. Scale shape unchanged: lazy 1→N
  // per-partition decode, the search is encode-side only. ---
  val m16McVideo = QueryDef.sql(
    "m16_mc_video",
    """WITH ids AS (SELECT id FROM generate_series(0,39) t(id)),
      |vid AS (SELECT id, 5 + (id % 3) AS nf FROM ids),
      |px AS (SELECT v.id, fs.f,
      |    (v.id + ((gx.x + 5*fs.f) % 32)*7 + gy.y*13) % 96 AS l
      |  FROM vid v, generate_series(0,6) fs(f),
      |       generate_series(0,31) gx(x), generate_series(0,23) gy(y)
      |  WHERE fs.f < v.nf)
      |SELECT id AS asset_id, f AS frame_no, 32 AS w, 24 AS h,
      |  CAST(sum(l) AS BIGINT) AS sum_luma, TRUE AS mc_compressed
      |FROM px GROUP BY id, f""".stripMargin) { (s, _) =>
    import graft.multimodal.Multimodal.VideoCodec
    val assets = Multimodal.synthesizeMcVideos(s, 0L until 40L)
    val audit = Multimodal.mjpegFrameAudit(
      Multimodal.repartitionForDecode(assets, 8)).toDF()
    // A/B compression evidence: the SAME frames, motion search off —
    // driver-sized (40 tiny fixtures), deterministic both sides
    (0L until 40L).foreach { id =>
      val nF = 5 + (id % 3).toInt
      val mcLen = VideoCodec.synthesizePanAvi(
        id, 32, 24, nF, keyEvery = 3, fps = 4, motion = true).length
      val plainLen = VideoCodec.synthesizePanAvi(
        id, 32, 24, nF, keyEvery = 3, fps = 4, motion = false).length
      require(mcLen * 3 < plainLen * 2,
        s"asset $id: motion vectors must earn their bytes: $mcLen vs $plainLen")
    }
    audit.select(col("asset_id"), col("frame_no"), col("w"), col("h"),
      col("sum_luma"), lit(true).as("mc_compressed"))
  }

  val all: Seq[QueryDef] = Seq(m1MediaFeatures, m2ImagePhash, m3AudioEnergy, m4ImageKnn,
    m5AudioTone, m6ImageNeardup, m7AudioNeardup, m8ImageTiles, m9AudioResample,
    m10VideoFrames, m11VideoNeardup, m12MjpegFrames, m13ShotBoundaries, m14DeltaVideo,
    m15MotionShots, m16McVideo)
}
