package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables => T}
import graft.functions.TextFns

/** Training-data preparation operators beyond dedup/quality: the steps
  * that turn a cleaned corpus into model-ready batches, each oracle-gated
  * on the documents table.
  *
  *   - t8: GPT-style concat-and-chunk sequence packing (token-budget
  *     context windows);
  *   - t9: corpus n-gram statistics (the classic massive-shuffle op,
  *     shaped for map-side partial aggregation);
  *   - t10: PII redaction (emails/IPv4/intl phones) with match counts —
  *     regex classes chosen to evaluate identically under Java regex and
  *     RE2 (no backreferences, no lookaround);
  *   - d5: eval-set contamination screening by n-gram overlap — the
  *     decontamination gate every pretraining corpus needs.
  */
object TrainPrep {

  private val sqlWsCollapsed = """trim(regexp_replace(text, '\s+', ' ', 'g'))"""
  private val sqlToks = s"string_split($sqlWsCollapsed, ' ')"

  // --- t8_pack_sequences: concatenate-then-chunk packing. Documents are
  // concatenated in deterministic order and cut every `budget` tokens;
  // a doc's pack is the chunk its first token falls in. Packing is a
  // sequential discipline, so it runs per (lang, shard) stratum: the
  // running sum is a window over each stratum, shard count scales with
  // the cluster, and no stratum ever funnels the corpus through one
  // task (the registry-wide no-partition-less-window guard applies). ---
  val t8PackSequences = QueryDef.sql(
    "t8_pack_sequences",
    s"""WITH d AS (SELECT doc_id, lang, doc_id % 8 AS shard,
       |  len($sqlToks) AS n_tokens FROM documents),
       |c AS (SELECT doc_id, lang, shard, n_tokens,
       |  COALESCE(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM d)
       |SELECT doc_id, lang, shard, n_tokens,
       |  CAST(prior // 512 AS BIGINT) AS pack_id,
       |  CAST(prior % 512 AS BIGINT) AS pack_offset
       |FROM c""".stripMargin) { (s, d) =>
    val budget = 512L
    val docs = T.documents(s, d).select(
      col("doc_id"), col("lang"), (col("doc_id") % 8).as("shard"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("prior", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        floor(col("prior") / budget).as("pack_id"),
        (col("prior") % budget).as("pack_offset"))
  }

  // --- t9_ngram_counts: global top-20 bigrams. explode → partial-agg
  // combine map-side → one shuffle on the 8-byte... here the bigram
  // string itself (the oracle needs the text); TakeOrdered handles the
  // final top-k without a single-partition sort. ---
  val t9NgramCounts = QueryDef.sql(
    "t9_ngram_counts",
    s"""WITH bg AS (SELECT t[i] || ' ' || t[i+1] AS ngram
       |  FROM (SELECT $sqlToks AS t FROM documents) toks,
       |  LATERAL (SELECT unnest(range(1, len(t))) AS i) r)
       |SELECT ngram, count(*) AS n FROM bg
       |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(explode(TextFns.shinglesRegex(col("text"), 2)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(20)
  }

  // --- t10_redact_pii: scrub emails / IPv4 / international phone
  // numbers, reporting per-doc match counts. The corpus is synthetic, so
  // PII is planted deterministically from doc_id with identical string
  // construction in both engines — every doc exercises every pattern.
  // DuckDB's regexp_replace needs the 'g' flag to match Spark's
  // replace-all semantics. ---
  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phonePat = "\\+\\d{7,15}"

  val t10RedactPii = QueryDef.sql(
    "t10_redact_pii",
    s"""WITH seeded AS (SELECT doc_id,
       |  text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com or +1415555' ||
       |  CAST(1000 + doc_id % 9000 AS VARCHAR) || ' host 10.0.' ||
       |  CAST(doc_id % 256 AS VARCHAR) || '.7' AS t FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$emailPat')) AS n_emails,
       |  len(regexp_extract_all(t, '$ipPat')) AS n_ips,
       |  len(regexp_extract_all(t, '$phonePat')) AS n_phones,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '$emailPat', '<EMAIL>', 'g'), '$ipPat', '<IP>', 'g'),
       |    '$phonePat', '<PHONE>', 'g') AS redacted
       |FROM seeded""".stripMargin) { (s, d) =>
    val seeded = T.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
        lit("@example.com or +1415555"),
        (lit(1000) + col("doc_id") % 9000).cast("string"),
        lit(" host 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")).as("t"))
    seeded.select(
      col("doc_id"),
      size(regexp_extract_all(col("t"), lit(emailPat), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("t"), lit(ipPat), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("t"), lit(phonePat), lit(0))).as("n_phones"),
      regexp_replace(regexp_replace(regexp_replace(col("t"),
        emailPat, "<EMAIL>"), ipPat, "<IP>"), phonePat, "<PHONE>").as("redacted"))
  }

  // --- d5_contamination: fraction of each doc's distinct 3-gram shingles
  // that appear anywhere in the eval set (docs with doc_id % 97 == 0 —
  // the stand-in for a benchmark suite). The eval shingle universe is
  // tiny relative to the corpus, so it BROADCASTS: per-doc cost is a
  // hashed semi-join probe, never a corpus-scale shuffle. Shingles are
  // hashed to 8-byte longs Spark-side (the string-based oracle doubles
  // as a collision check, as in d2). ---
  val d5Contamination = QueryDef.sql(
    "d5_contamination",
    s"""WITH sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) toks,
       |  LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
       |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
       |scored AS (
       |  SELECT sh.doc_id, count(*) AS n_shingles,
       |    CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
       |  FROM sh LEFT JOIN ev ON sh.s = ev.s
       |  WHERE sh.doc_id % 97 <> 0
       |  GROUP BY sh.doc_id)
       |SELECT doc_id, n_shingles, n_overlap,
       |  CAST(n_overlap AS DOUBLE) / n_shingles AS contamination
       |FROM scored""".stripMargin) { (s, d) =>
    val sh = T.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesRegex(col("text"), 3))).as("str"))
      .select(col("doc_id"), xxhash64(col("str")).as("s"))
    val ev = sh.filter(col("doc_id") % 97 === 0).select(col("s")).distinct()
    sh.filter(col("doc_id") % 97 =!= 0).as("sh")
      .join(broadcast(ev.withColumn("hit", lit(1))).as("ev"),
        col("sh.s") === col("ev.s"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_shingles")).as("contamination"))
  }

  // --- d9_bloom_screen: Bloom-filter contamination screen — d5's exact
  // semi-join replaced by a 65536-bit filter over the eval shingles that
  // rides the plan as ONE literal: the corpus-side test is a pure
  // map-side projection (k=2 md5 positions → 2 array lookups), no join
  // or shuffle of the corpus at all. False positives are deterministic
  // (md5 positions, no RNG), so the oracle reproduces the exact same
  // flagged set — n_exact_hits = 0 rows ARE the FPs, visible and gated.
  // At 100 TB this is the screen you run FIRST; the exact join (d5)
  // runs only on the tiny flagged remainder. ---
  val d9BloomScreen = QueryDef.sql(
    "d9_bloom_screen",
    s"""WITH sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) toks,
       |  LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
       |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
       |occ AS (SELECT DISTINCT p FROM (
       |    SELECT CAST(concat('0x', substr(md5('0:' || s), 1, 4)) AS BIGINT) AS p FROM ev
       |    UNION ALL
       |    SELECT CAST(concat('0x', substr(md5('1:' || s), 1, 4)) AS BIGINT) FROM ev) u),
       |hits AS (SELECT c.doc_id,
       |    CASE WHEN o0.p IS NOT NULL AND o1.p IS NOT NULL THEN 1 ELSE 0 END AS bh,
       |    CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END AS eh
       |  FROM (SELECT doc_id, s,
       |      CAST(concat('0x', substr(md5('0:' || s), 1, 4)) AS BIGINT) AS p0,
       |      CAST(concat('0x', substr(md5('1:' || s), 1, 4)) AS BIGINT) AS p1
       |    FROM sh WHERE doc_id % 97 <> 0) c
       |  LEFT JOIN occ o0 ON c.p0 = o0.p
       |  LEFT JOIN occ o1 ON c.p1 = o1.p
       |  LEFT JOIN ev e ON c.s = e.s)
       |SELECT doc_id, count(*) AS n_shingles,
       |  CAST(sum(bh) AS BIGINT) AS n_bloom_hits, CAST(sum(eh) AS BIGINT) AS n_exact_hits
       |FROM hits GROUP BY doc_id HAVING sum(bh) > 0""".stripMargin) { (s, d) =>
    import graft.operators.BloomScreen
    val sh = T.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesRegex(col("text"), 3))).as("s"))
    val ev = sh.filter(col("doc_id") % 97 === 0).select(col("s")).distinct()
    val bits = BloomScreen.buildBits(ev, "s", k = 2)
    sh.filter(col("doc_id") % 97 =!= 0)
      .withColumn("bh", when(BloomScreen.hit(bits, col("s"), k = 2), 1).otherwise(0))
      .join(broadcast(ev.withColumn("ex", lit(1))), Seq("s"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("bh")).as("n_bloom_hits"),
        sum(coalesce(col("ex"), lit(0))).as("n_exact_hits"))
      .filter(col("n_bloom_hits") > 0)
  }

  // --- t11_unigram_logprob: language-model quality proxy — per-doc mean
  // unigram log-probability under the corpus's own unigram distribution
  // (the cheap stand-in for KenLM perplexity filtering). Two shuffles:
  // vocabulary count, then the token→frequency join (zipf-hot tokens are
  // exactly what AQE's skew split handles; the corpus total rides a
  // broadcast scalar, q22's pattern). Oracle parity: each token's ln() is
  // quantized to DECIMAL(8,5) BEFORE summation — the per-doc sum is then
  // exact and order-independent, immune to double-summation ordering and
  // to 1-ulp libm differences between engines. ---
  val t11UnigramLogprob = QueryDef.sql(
    "t11_unigram_logprob",
    s"""WITH toks AS (SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
       |vocab AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
       |tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM vocab),
       |lp AS (SELECT t.doc_id,
       |    CAST(ln(CAST(v.tf AS DOUBLE) / tot.n) AS DECIMAL(8,5)) AS l
       |  FROM toks t JOIN vocab v USING (tok), tot)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(l) AS DOUBLE) / count(*) AS logprob
       |FROM lp GROUP BY doc_id""".stripMargin) { (s, d) =>
    val toks = T.documents(s, d)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val tot = vocab.agg(sum(col("tf")).cast("double").as("n"))
    toks.join(vocab, "tok")
      .join(broadcast(tot))
      .withColumn("l", log(col("tf").cast("double") / col("n")).cast("decimal(8,5)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("l")).cast("double") / count(lit(1))).as("logprob"))
  }

  // --- t12_repetition: within-document repetition signals (the Gopher-
  // rule quality filters): bigram duplicate ratio and the hottest
  // bigram's count. Distinct counts stay inside codegen'd array
  // expressions; the per-doc hottest-bigram count explodes and
  // aggregates with map-side combine (grouped by (doc, bigram) — never
  // a global hot key). ---
  val t12Repetition = QueryDef.sql(
    "t12_repetition",
    s"""WITH bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS ngram
       |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) toks,
       |  LATERAL (SELECT unnest(range(1, len(t))) AS i) r),
       |per AS (SELECT doc_id, ngram, count(*) AS c FROM bg GROUP BY doc_id, ngram)
       |SELECT doc_id,
       |  CAST(sum(c) AS BIGINT) AS n_bigrams,
       |  count(*) AS n_distinct_bigrams,
       |  1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS dup_ratio,
       |  CAST(max(c) AS BIGINT) AS max_bigram_count
       |FROM per GROUP BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), explode(TextFns.shinglesRegex(col("text"), 2)).as("ngram"))
      .groupBy(col("doc_id"), col("ngram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        (lit(1.0) - count(lit(1)).cast("double") / sum(col("c"))).as("dup_ratio"),
        max(col("c")).as("max_bigram_count"))
  }

  // --- t14_normalize_text: Unicode NFC canonicalization + markup
  // stripping — visually-identical strings with decomposed combining
  // marks must hash identically before any fingerprint/dedup step.
  // Spark side runs the codegen'd [[graft.functions.NfcNormalize]]
  // expression (no UDF, stays in the fused stage); the oracle uses
  // DuckDB's nfc_normalize. Non-NFC content and markup are planted
  // deterministically (the fixture corpus is ASCII) so every row
  // exercises both transforms. ---
  val t14NormalizeText = QueryDef.sql(
    "t14_normalize_text",
    """WITH seeded AS (SELECT doc_id,
      |  text || ' <b>bold</b> caf' || 'e' || chr(769) AS t FROM documents)
      |SELECT doc_id,
      |  length(t) AS raw_len,
      |  length(nfc_normalize(t)) AS nfc_len,
      |  length(regexp_replace(nfc_normalize(t), '<[^>]+>', '', 'g')) AS clean_len,
      |  nfc_normalize(t) <> t AS nfc_changed
      |FROM seeded""".stripMargin) { (s, d) =>
    import graft.functions.NfcNormalize
    val seeded = T.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" <b>bold</b> caf"), lit("e\u0301")).as("t"))
    seeded.select(
      col("doc_id"),
      length(col("t")).as("raw_len"),
      length(NfcNormalize.of(col("t"))).as("nfc_len"),
      length(regexp_replace(NfcNormalize.of(col("t")), "<[^>]+>", "")).as("clean_len"),
      (NfcNormalize.of(col("t")) =!= col("t")).as("nfc_changed"))
  }

  /** End-to-end pretraining-corpus preparation — the composed pipeline a
    * user actually runs, chaining the oracle-gated pieces:
    *
    *   1. normalize (NFC canonicalization — codegen'd);
    *   2. quality gate (alpha-ratio heuristic, t2's signal);
    *   3. exact dedup (first-wins on normalized-text fingerprint);
    *   4. near-dup clusters (MinHash LSH pairs → connected components →
    *      min-id survivor per cluster, d3+d6);
    *   4b. OPTIONAL semantic dedup (SemDeDup, d7): when an embeddings
    *      frame (vec_id = doc_id, embedding) is supplied, survivors with
    *      a smaller-id in-k-means-cell near-duplicate (cosine >= semTau)
    *      are dropped; docs without an embedding pass through;
    *   5. contamination screen vs an eval id set (d5's broadcast probe);
    *   5b. verbatim-leak screen (d8's exact complement): training docs
    *      containing an eval doc's `verbatimProbeLen`-char prefix
    *      verbatim are dropped (0 disables);
    *   6. mixture rebalancing by per-language quota (t13's hash rank);
    *   7. sequence packing into `budget`-token windows (t8).
    *
    * Returns the packed survivor corpus: (doc_id, lang, n_tokens,
    * pack_id, pack_offset). Each stage only shrinks the frame before the
    * next (filters first, pairwise work on survivors only), and every
    * shuffle is on a bounded key set — the composition inherits each
    * operator's 100 TB shape.
    */
  def prepareCorpus(
      spark: SparkSession,
      dir: String,
      evalIds: Column => Column = _ % 97 === 0,
      minAlphaRatio: Double = 0.5,
      maxContamination: Double = 0.5,
      quota: Column = when(col("lang") === "en", 80).otherwise(30),
      budget: Long = 512L,
      embeddings: Option[DataFrame] = None,
      semTau: Double = 0.3,
      verbatimProbeLen: Int = 20): DataFrame = {
    import graft.functions.NfcNormalize
    val docs = T.documents(spark, dir).select(col("doc_id"), col("lang"),
      NfcNormalize.of(col("text")).as("text"))

    // 2. quality gate — cheap narrow projection, drops rows before any join
    val quality = docs.filter(
      TextFns.alphaChars(col("text")).cast("double") / length(col("text")) >= minAlphaRatio)

    // 3. exact dedup, first doc_id wins per fingerprint
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val exact = quality
      .withColumn("fp", TextFns.fingerprint(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("fp", "__rn")

    // 4. near-dup clusters on the exact-survivors, keep min-id per cluster
    val sh = exact.select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesRegex(col("text"), 3))).as("str"))
      .select(col("doc_id"), xxhash64(col("str")).as("s"))
    val mh = exact
      .select(col("doc_id"), array_distinct(TextFns.shinglesRegex(col("text"), 3)).as("shs"))
      .filter(size(col("shs")) > 0)
      .select(col("doc_id"), graft.functions.MinHash16.of(col("shs")).as("mh"))
    val bandCols = (0 until 4).map { k =>
      md5(concat_ws("|", (0 until 4).map(j => element_at(col("mh"), k * 4 + j + 1)): _*))
    }
    val sig = mh.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "sig")))
    val pairs = sig.as("x").join(sig.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val clusters = graft.operators.Components.connectedComponents(pairs)
    val nearDupLosers = clusters.filter(col("id") =!= col("cluster_id")).select(col("id"))
    val deduped0 = exact.join(nearDupLosers, exact("doc_id") === nearDupLosers("id"), "left_anti")

    // 4b. optional SemDeDup: embedding-space near-dups within k-means
    // cells (d7's operator), restricted to surviving docs that have an
    // embedding; docs without one pass through untouched
    val deduped = embeddings match {
      case None => deduped0
      case Some(emb0) =>
        val embq = emb0
          .join(deduped0.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
          .select(col("vec_id"), Similarity.quantize("embedding").as("q"))
        deduped0.join(Clustering.semanticDropIds(embq, 2, semTau),
          deduped0("doc_id") === col("vec_id"), "left_anti")
    }

    // 5. contamination screen: drop docs overlapping the eval set too much
    val ev = sh.filter(evalIds(col("doc_id"))).select("s").distinct()
    val contaminated = sh.filter(!evalIds(col("doc_id")))
      .join(broadcast(ev.withColumn("hit", lit(1))), Seq("s"), "left_outer")
      .groupBy(col("doc_id"))
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))).as("c"))
      .filter(col("c") > maxContamination).select("doc_id")
    val screened0 = deduped
      .filter(!evalIds(col("doc_id"))) // eval docs never train
      .join(contaminated, Seq("doc_id"), "left_anti")

    // 5b. verbatim-leak screen: eval prefix probes broadcast, one
    // contains() pass over the survivors (d8's shape)
    val screened =
      if (verbatimProbeLen <= 0) screened0
      else {
        val probes = docs.filter(evalIds(col("doc_id")))
          .filter(length(col("text")) >= verbatimProbeLen)
          .select(substring(col("text"), 1, verbatimProbeLen).as("__probe")).distinct()
        val leaky = screened0.crossJoin(broadcast(probes))
          .filter(instr(col("text"), col("__probe")) > 0)
          .select(col("doc_id")).distinct()
        screened0.join(leaky, Seq("doc_id"), "left_anti")
      }

    // 6. rebalance to the target mixture by deterministic hash rank
    val wq = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val mixed = screened.withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= quota).drop("__rn")

    // 7. pack into budget-token context windows per (lang, shard)
    val wp = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    mixed
      .select(col("doc_id"), col("lang"), (col("doc_id") % 8).as("shard"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("prior", coalesce(sum(col("n_tokens")).over(wp), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        floor(col("prior") / budget).as("pack_id"),
        (col("prior") % budget).as("pack_offset"))
  }

  // --- t16_temperature_mix: temperature-scaled language mixture — the
  // standard multilingual-training resampler (weights ∝ n_lang^(1/T),
  // here T=2 i.e. sqrt: low-resource languages are upsampled relative
  // to their share). Quotas are computed FROM the corpus (t13's quotas
  // were fixed constants), the scalar normalizer broadcasts (q22
  // pattern — never a single-partition window), and per-language
  // selection is the deterministic md5 hash rank. floor() keeps the
  // quota boundary exact-integer on both engines. ---
  val t16TemperatureMix = QueryDef.sql(
    "t16_temperature_mix",
    """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      |tot AS (SELECT sum(sqrt(CAST(n AS DOUBLE))) AS z FROM counts),
      |quota AS (SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE)) / z * 200) AS BIGINT) AS q
      |          FROM counts, tot),
      |ranked AS (SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT r.doc_id, r.lang FROM ranked r JOIN quota ON r.lang = quota.lang
      |WHERE r.rn <= quota.q""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(sqrt(col("n").cast("double"))).as("z"))
    val quota = counts.crossJoin(broadcast(tot))
      .select(col("lang"),
        floor(sqrt(col("n").cast("double")) / col("z") * lit(200)).cast("long").as("q"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .join(broadcast(quota), Seq("lang"))
      .filter(col("rn") <= col("q"))
      .select(col("doc_id"), col("lang"))
  }

  // --- t20_weighted_sample: weighted Bernoulli sampling — every doc is
  // kept with probability proportional to its length (the standard
  // size-proportional corpus sampler; expected sample ≈ 100 docs at any
  // scale). The uniform draw is the first 32 md5 bits of the doc id as
  // an EXACT double in [0,1) (v/2^32 — both numerator and denominator
  // are dyadic, so the division is lossless and the keep decision is
  // bit-identical on both engines; Spark conv(hex) ≡ DuckDB
  // CAST('0x…')). One scan + one broadcast scalar — no shuffle of the
  // corpus at all, embarrassingly parallel at 100 TB. ---
  val t20WeightedSample = QueryDef.sql(
    "t20_weighted_sample",
    """WITH tot AS (SELECT sum(n_chars) AS w FROM documents),
      |s AS (SELECT doc_id, n_chars,
      |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
      |      / CAST(4294967296 AS DOUBLE) AS u,
      |    CAST(100 * n_chars AS DOUBLE) / CAST(w AS DOUBLE) AS p
      |  FROM documents, tot)
      |SELECT doc_id, n_chars, u, p FROM s WHERE u < p""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d).select(col("doc_id"), col("n_chars"))
    val tot = docs.agg(sum(col("n_chars")).as("w"))
    docs.crossJoin(broadcast(tot))
      .withColumn("u", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)" +
          " / CAST(4294967296 AS DOUBLE)"))
      .withColumn("p", expr("CAST(100 * n_chars AS DOUBLE) / CAST(w AS DOUBLE)"))
      .filter(col("u") < col("p"))
      .select(col("doc_id"), col("n_chars"), col("u"), col("p"))
  }

  // --- t17_feature_hashing: hashing-trick document vectors — the
  // model-free way to get documents into the vector operators (v1-v6):
  // every token hashes into one of 16 md5 buckets, per-(doc, bucket)
  // counts form a sparse bag-of-words embedding in long format. One
  // explode + one partial-aggregated shuffle; bucket ids are hex chars
  // so both engines agree without any hex→int conversion. ---
  val t17FeatureHashing = QueryDef.sql(
    "t17_feature_hashing",
    """WITH tok AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS t
      |  FROM documents)
      |SELECT doc_id, substr(md5(t), 1, 1) AS b, count(*) AS cnt
      |FROM tok GROUP BY doc_id, b""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), substring(md5(col("t")), 1, 1).as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  // --- t18_doc_knn: model-free similar-document search — t17's hashed
  // count vectors scored by cosine via an INVERTED-INDEX join (sparse
  // dot product: pairs meet only on shared buckets, missing buckets
  // contribute zero exactly as the math says). The query side (docs
  // 0-4) broadcasts; counts are integers so dot and norms are exact;
  // only the final cosine is double, same expression shape both
  // engines. Top-3 per query, unique tie-break. ---
  val t18DocKnn = QueryDef.sql(
    "t18_doc_knn",
    """WITH tok AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS t
      |  FROM documents),
      |v AS (SELECT doc_id, substr(md5(t), 1, 1) AS b, count(*) AS cnt
      |  FROM tok GROUP BY doc_id, b),
      |norms AS (SELECT doc_id, CAST(sum(cnt * cnt) AS BIGINT) AS n2 FROM v GROUP BY doc_id),
      |dots AS (SELECT q.doc_id AS qid, c.doc_id AS cid, CAST(sum(q.cnt * c.cnt) AS BIGINT) AS dot
      |  FROM v q JOIN v c ON q.b = c.b AND q.doc_id < 5 AND c.doc_id <> q.doc_id
      |  GROUP BY qid, cid),
      |scored AS (SELECT qid, cid,
      |    CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cosine
      |  FROM dots JOIN norms nq ON nq.doc_id = qid JOIN norms nc ON nc.doc_id = cid)
      |SELECT qid, cid, cosine, rank FROM (
      |  SELECT qid, cid, cosine,
      |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      |  FROM scored) t
      |WHERE rank <= 3""".stripMargin) { (s, d) =>
    val v = T.documents(s, d)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), substring(md5(col("t")), 1, 1).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val norms = v.groupBy(col("doc_id")).agg(sum(col("cnt") * col("cnt")).as("n2"))
    val q = v.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("b"), col("cnt").as("qcnt"))
    val dots = v.join(broadcast(q), Seq("b"))
      .filter(col("doc_id") =!= col("qid"))
      .groupBy(col("qid"), col("doc_id").as("cid"))
      .agg(sum(col("qcnt") * col("cnt")).as("dot"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    dots
      .join(norms.select(col("doc_id").as("qid"), col("n2").as("nq")), Seq("qid"))
      .join(norms.select(col("doc_id").as("cid"), col("n2").as("nc")), Seq("cid"))
      .withColumn("cosine", col("dot").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  // --- d8_verbatim_leak: EXACT-substring eval contamination — the
  // complement of d5's shingle-overlap screen: d5 scores fuzzy overlap,
  // this one catches verbatim leaks (an eval doc's canonical 20-char
  // prefix appearing inside a training doc). The probe set is tiny and
  // broadcasts; the corpus side is one codegen'd contains() pass per
  // probe — the deliberate broadcast-nested-loop shape (like v1's
  // brute-force baseline): every doc genuinely must be tested against
  // every probe. Spark instr ≡ DuckDB strpos. ---
  val d8VerbatimLeak = QueryDef.sql(
    "d8_verbatim_leak",
    """WITH ev AS (SELECT doc_id AS eval_id,
      |    substr(trim(regexp_replace(text, '\s+', ' ', 'g')), 1, 20) AS probe
      |  FROM documents
      |  WHERE doc_id %% 97 = 0 AND len(trim(regexp_replace(text, '\s+', ' ', 'g'))) >= 20)
      |SELECT d.doc_id, e.eval_id
      |FROM documents d, ev e
      |WHERE d.doc_id %% 97 <> 0
      |  AND strpos(trim(regexp_replace(d.text, '\s+', ' ', 'g')), e.probe) > 0""".stripMargin
      .replace("%%", "%")) { (s, d) =>
    val canon = trim(regexp_replace(col("text"), "\\s+", " "))
    val probes = T.documents(s, d)
      .filter(col("doc_id") % 97 === 0 && length(canon) >= 20)
      .select(col("doc_id").as("eval_id"), substring(canon, 1, 20).as("probe"))
    T.documents(s, d)
      .filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), canon.as("t"))
      .crossJoin(broadcast(probes))
      .filter(instr(col("t"), col("probe")) > 0)
      .select(col("doc_id"), col("eval_id"))
  }

  // --- t19_tfidf: top-3 TF-IDF terms per document — the classic
  // keyword-extraction op. Term frequencies and document frequencies
  // are two partial-aggregated integer aggregates; N broadcasts as a
  // scalar; the score (tf · ln(N/df)) runs in double with the identical
  // expression shape on both engines, ties broken by term. The df join
  // keys on the term — hot stopword terms are AQE-skew territory, and
  // the per-doc ranking window is partitioned (never global). ---
  val t19Tfidf = QueryDef.sql(
    "t19_tfidf",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS t FROM documents),
       |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY doc_id, t),
       |dfx AS (SELECT t, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY t),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
       |SELECT doc_id, t AS term, score, rank FROM (
       |  SELECT tf.doc_id, tf.t,
       |    CAST(c AS DOUBLE) * ln(CAST(n AS DOUBLE) / CAST(dfc AS DOUBLE)) AS score,
       |    row_number() OVER (PARTITION BY tf.doc_id
       |      ORDER BY CAST(c AS DOUBLE) * ln(CAST(n AS DOUBLE) / CAST(dfc AS DOUBLE)) DESC, tf.t) AS rank
       |  FROM tf JOIN dfx USING (t), nn) s
       |WHERE rank <= 3""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val tok = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
    val tf = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    val dfx = tf.groupBy(col("t")).agg(count(lit(1)).as("dfc"))
    val nn = docs.agg(count(lit(1)).as("n"))
    val score = col("c").cast("double") * log(col("n").cast("double") / col("dfc").cast("double"))
    val w = Window.partitionBy(col("doc_id")).orderBy(score.desc, col("t"))
    tf.join(dfx, Seq("t")).crossJoin(broadcast(nn))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("t").as("term"), col("score"), col("rank"))
  }

  // --- t21_chunk_overlap: fixed-window overlapping character chunking —
  // the step that turns cleaned documents into retrieval/context windows
  // (chunk size 120, stride 90 → 30-char overlap so no boundary loses
  // context). Pure per-row codegen work: sequence → posexplode →
  // substring, NO shuffle anywhere — at 100 TB this is a map-only pass
  // whose output partitioning inherits the input's. Complements t8
  // (token packing): t8 packs whole docs into budgets, t21 splits long
  // docs into overlapping windows. ---
  val t21ChunkOverlap = QueryDef.sql(
    "t21_chunk_overlap",
    """SELECT doc_id, CAST(o // 90 AS BIGINT) AS chunk_id, o AS chunk_off,
      |  substr(text, CAST(o + 1 AS BIGINT), 120) AS chunk,
      |  len(substr(text, CAST(o + 1 AS BIGINT), 120)) AS chunk_len
      |FROM (SELECT doc_id, text, len(text) AS n FROM documents WHERE len(text) > 0) d,
      |LATERAL (SELECT CAST(unnest(range(0, n, 90)) AS BIGINT) AS o) r""".stripMargin) { (s, d) =>
    val win = 120; val stride = 90
    T.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), (length(col("text")) - 1).cast("long"),
          lit(stride.toLong))).as("chunk_off"))
      .select(col("doc_id"),
        (col("chunk_off") / stride).cast("long").as("chunk_id"),
        col("chunk_off"),
        expr(s"substring(text, CAST(chunk_off + 1 AS INT), $win)").as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  // --- d10_containment_pairs: PAIRWISE benchmark decontamination — for
  // each (corpus doc, eval doc) pair, the fraction of the EVAL doc's
  // distinct 3-gram shingles contained in the corpus doc (asymmetric
  // containment |E∩C|/|E|, the measure that catches a benchmark quoted
  // inside a larger page where symmetric Jaccard stays low). d5 screens
  // against the eval UNION; this attributes contamination to a specific
  // benchmark item. As with t10's seeded PII, contamination is INJECTED
  // deterministically (every 31st corpus doc quotes a 150-char prefix of
  // one of eval docs 0/97/194) so the flagged set is non-empty and the
  // 0.25 threshold provably separates it from natural background overlap
  // (seeded ≥ 0.45, background ≤ 0.06 on the fixtures). Scale shape: the
  // eval side is tiny and BROADCASTS twice (shingle probe + size lookup);
  // the corpus is touched once, shuffled only by (corpus_doc, eval_doc)
  // pair for the overlap count — bounded by matches, not corpus size. ---
  val d10ContainmentPairs = QueryDef.sql(
    "d10_containment_pairs",
    s"""WITH evsrc AS (SELECT doc_id AS eid, text AS etext FROM documents
       |  WHERE doc_id IN (0, 97, 194)),
       |corp AS (SELECT d.doc_id,
       |    CASE WHEN d.doc_id % 97 <> 0 AND d.doc_id % 31 = 0 AND e.etext IS NOT NULL
       |         THEN d.text || ' ' || substr(e.etext, 1, 150) ELSE d.text END AS text
       |  FROM documents d LEFT JOIN evsrc e ON e.eid = 97 * (d.doc_id % 3)),
       |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, $sqlToks AS t FROM corp) toks,
       |  LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
       |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 97 = 0),
       |evn AS (SELECT eval_id, count(*) AS n_ev FROM ev GROUP BY eval_id),
       |ov AS (SELECT sh.doc_id, ev.eval_id, count(*) AS n_common
       |  FROM sh JOIN ev ON sh.s = ev.s
       |  WHERE sh.doc_id % 97 <> 0
       |  GROUP BY sh.doc_id, ev.eval_id)
       |SELECT ov.doc_id, ov.eval_id, n_common, n_ev,
       |  CAST(n_common AS DOUBLE) / n_ev AS containment
       |FROM ov JOIN evn USING (eval_id)
       |WHERE 4 * n_common >= n_ev""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d).select(col("doc_id"), col("text"))
    val evsrc = docs.filter(col("doc_id").isin(0L, 97L, 194L))
      .select(col("doc_id").as("eid"), col("text").as("etext"))
    val corp = docs
      .join(broadcast(evsrc), col("eid") === lit(97) * (col("doc_id") % 3), "left_outer")
      .select(col("doc_id"),
        when(col("doc_id") % 97 =!= 0 && col("doc_id") % 31 === 0 && col("etext").isNotNull,
          concat(col("text"), lit(" "), substring(col("etext"), 1, 150)))
          .otherwise(col("text")).as("text"))
    val sh = corp
      .select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesRegex(col("text"), 3))).as("str"))
      .select(col("doc_id"), xxhash64(col("str")).as("s"))
    val ev = sh.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("s"))
    val evn = ev.groupBy(col("eval_id")).agg(count(lit(1)).as("n_ev"))
    sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(ev), Seq("s"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(evn), Seq("eval_id"))
      .filter(lit(4) * col("n_common") >= col("n_ev"))
      .select(col("doc_id"), col("eval_id"), col("n_common"), col("n_ev"),
        (col("n_common").cast("double") / col("n_ev")).as("containment"))
  }

  // --- t22_jsonl_ingest: the JSONL corpus path — LLM training corpora
  // arrive as newline-delimited JSON, not parquet. The query round-trips
  // documents through a real JSONL write + schema'd read (explicit
  // schema: at 100 TB you never pay a second inference pass over the
  // files), then aggregates per lang with a content fingerprint: an
  // order-independent SUM of per-doc md5-prefix integers over `text`.
  // The oracle computes the same aggregate from the parquet directly, so
  // the hash match proves the JSONL encode/decode is LOSSLESS on every
  // document (any escaping/unicode mangling shifts the fingerprint). ---
  val t22JsonlIngest = QueryDef.sql(
    "t22_jsonl_ingest",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(len(text)) AS BIGINT) AS sum_text_len,
      |  CAST(sum(CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT) AS text_fingerprint
      |FROM documents
      |GROUP BY lang""".stripMargin) { (s, d) =>
    val stage = graft.Scratch.dir("t22-jsonl")
    T.documents(s, d).write.mode("overwrite").json(stage)
    s.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .json(stage)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("long")).as("sum_text_len"),
        sum(expr("CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)"))
          .as("text_fingerprint"))
  }

  // --- t23_sentence_stats: sentence segmentation + per-document
  // sentence-shape signals (count, longest, mean length) — the quality
  // dimension t1/t2's token stats don't see (wall-of-text vs properly
  // punctuated prose). Split on terminal punctuation runs + whitespace;
  // the pattern stays inside both engines' regex subset (no lookbehind
  // — DuckDB is RE2). Map-side explode + one partial-aggregated
  // (doc_id) aggregate: a linear pass at any corpus size. ---
  val t23SentenceStats = QueryDef.sql(
    "t23_sentence_stats",
    """SELECT doc_id, count(*) AS n_sentences,
      |  CAST(max(len(s)) AS BIGINT) AS max_sentence_len,
      |  CAST(sum(len(s)) AS BIGINT) AS sum_sentence_len,
      |  CAST(sum(len(s)) AS DOUBLE) / count(*) AS mean_sentence_len
      |FROM (SELECT doc_id, unnest(string_split_regex(text, '[.!?]+\s+')) AS s
      |      FROM documents)
      |WHERE len(s) > 0
      |GROUP BY doc_id""".stripMargin) { (s, d) =>
    T.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "[.!?]+\\s+")).as("sn"))
      .filter(length(col("sn")) > 0)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sentences"),
        max(length(col("sn"))).cast("long").as("max_sentence_len"),
        sum(length(col("sn"))).cast("long").as("sum_sentence_len"),
        (sum(length(col("sn"))).cast("double") / count(lit(1))).as("mean_sentence_len"))
  }

  // --- t25_data_cards: per-(source, lang) dataset cards — the corpus
  // composition summary every training-mix decision starts from: doc
  // counts, size totals, short-doc contamination share, and each
  // slice's fraction of the whole corpus. Two partial-aggregated hash
  // aggregates plus one broadcast scalar; the card of a 100 TB corpus
  // is one linear pass. ---
  val t25DataCards = QueryDef.sql(
    "t25_data_cards",
    """WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
      |SELECT source, lang,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(min(n_chars) AS BIGINT) AS min_chars,
      |  CAST(max(n_chars) AS BIGINT) AS max_chars,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars,
      |  CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
      |  CAST(count(*) AS DOUBLE) / CAST(n AS DOUBLE) AS corpus_share
      |FROM documents, tot
      |GROUP BY source, lang, n""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val tot = docs.agg(count(lit(1)).as("n"))
    docs.crossJoin(broadcast(tot))
      .groupBy(col("source"), col("lang"), col("n"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("n_chars")).cast("long").as("min_chars"),
        max(col("n_chars")).cast("long").as("max_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars"),
        sum(when(col("n_chars") < 100, 1).otherwise(0)).cast("long").as("n_short"),
        (count(lit(1)).cast("double") / col("n").cast("double")).as("corpus_share"))
      .drop("n")
  }

  // --- t15_leak_safe_split: train/val/test assignment keyed on the
  // CONTENT fingerprint, not the row id — exact duplicates must land in
  // the same split or held-out data leaks into training verbatim (the
  // split-time complement of d5/d8's contamination screens). Bucket =
  // first byte of md5(text): < 0xcc → train (~80%), < 0xe6 → val
  // (~10%), else test; deterministic across engines, runs, and
  // cluster sizes (rand() is none of those). Scale: a narrow
  // projection — no shuffle, no state; the split of a 100 TB corpus is
  // one codegen'd map stage. ---
  val t15LeakSafeSplit = QueryDef.sql(
    "t15_leak_safe_split",
    """SELECT doc_id, md5(text) AS fp,
      |  CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
      |       WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin) { (s, d) =>
    T.documents(s, d).select(
      col("doc_id"), md5(col("text")).as("fp"),
      when(substring(md5(col("text")), 1, 2) < "cc", "train")
        .when(substring(md5(col("text")), 1, 2) < "e6", "val")
        .otherwise("test").as("split"))
  }

  // --- t24_bigram_pmi: corpus collocations by pointwise mutual
  // information — PMI(x,y) = ln(c_xy·N² / (B·c_x·c_y)), the standard
  // collocation score over exact integer counts (bigram count c_xy,
  // unigram counts c_x/c_y, totals N/B). t11's parity discipline: the
  // only transcendental, ln(), runs once per surviving bigram on an
  // exact rational and is quantized to DECIMAL(8,5) before the ORDER BY,
  // so 1-ulp libm differences between engines cannot reorder the top-k
  // (ties break on the ngram). Shape: two token-level hash aggregates
  // (both map-side combined), two vocab equi-joins on the c_xy table
  // (already collapsed to distinct bigrams, ≥5 occurrences), scalar
  // totals ride a broadcast — no windows, no self-joins. ---
  val t24BigramPmi = QueryDef.sql(
    "t24_bigram_pmi",
    s"""WITH bg AS (SELECT t[i] AS w1, t[i+1] AS w2, t[i] || ' ' || t[i+1] AS ngram
       |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) toks,
       |  LATERAL (SELECT unnest(range(1, len(t))) AS i) r),
       |cxy AS (SELECT ngram, w1, w2, count(*) AS nxy FROM bg
       |        GROUP BY ngram, w1, w2 HAVING count(*) >= 5),
       |tok AS (SELECT unnest($sqlToks) AS tok FROM documents),
       |cx AS (SELECT tok, count(*) AS nx FROM tok GROUP BY tok),
       |tots AS (SELECT CAST((SELECT count(*) FROM tok) AS DOUBLE) AS n,
       |                CAST((SELECT count(*) FROM bg) AS DOUBLE) AS b),
       |pmi AS (SELECT c.ngram, c.nxy,
       |    CAST(ln(CAST(c.nxy AS DOUBLE) * n * n / (b * CAST(a.nx AS DOUBLE) * CAST(y.nx AS DOUBLE))) AS DECIMAL(8,5)) AS pv
       |  FROM cxy c JOIN cx a ON a.tok = c.w1 JOIN cx y ON y.tok = c.w2, tots)
       |SELECT ngram, nxy, CAST(pv AS DOUBLE) AS pmi FROM pmi
       |ORDER BY pv DESC, ngram LIMIT 20""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val bg = docs.select(explode(TextFns.shinglesRegex(col("text"), 2)).as("ngram"))
    val cxy = bg.groupBy(col("ngram")).agg(count(lit(1)).as("nxy"))
      .filter(col("nxy") >= 5)
      .withColumn("w1", element_at(split(col("ngram"), " "), 1))
      .withColumn("w2", element_at(split(col("ngram"), " "), 2))
    val tok = docs.select(explode(TextFns.tokens(col("text"))).as("tok"))
    val cx = tok.groupBy(col("tok")).agg(count(lit(1)).as("nx"))
    val tots = tok.agg(count(lit(1)).cast("double").as("n"))
      .crossJoin(bg.agg(count(lit(1)).cast("double").as("b")))
    cxy
      .join(cx.select(col("tok").as("w1"), col("nx").as("nx1")), Seq("w1"))
      .join(cx.select(col("tok").as("w2"), col("nx").as("nx2")), Seq("w2"))
      .crossJoin(broadcast(tots))
      .withColumn("pv",
        log(col("nxy").cast("double") * col("n") * col("n") /
          (col("b") * col("nx1").cast("double") * col("nx2").cast("double")))
          .cast("decimal(8,5)"))
      .orderBy(col("pv").desc, col("ngram"))
      .limit(20)
      .select(col("ngram"), col("nxy"), col("pv").cast("double").as("pmi"))
  }

  // --- t26_mix_entropy: per-source language-mix Shannon entropy — the
  // dataset-mix diagnostic behind t13/t16's rebalancing (entropy 0 =
  // monolingual source, ln(k) = uniform over k languages). Exactness:
  // probabilities are exact rationals rendered identically in double,
  // each −p·ln(p) term quantizes to DECIMAL(10,7) before the per-source
  // sum (t11's ln discipline: order-independent, ulp-immune). One
  // (source, lang) count aggregate — entropy of a 100 TB corpus costs
  // one map-side-combined pass. ---
  val t26MixEntropy = QueryDef.sql(
    "t26_mix_entropy",
    """WITH c AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang),
      |t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY source),
      |e AS (SELECT c.source, c.n, t.tot,
      |    CAST(-(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
      |      * ln(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE)) AS DECIMAL(10,7)) AS term
      |  FROM c JOIN t USING (source))
      |SELECT source, count(*) AS n_langs, CAST(min(tot) AS BIGINT) AS n_docs,
      |  CAST(sum(term) AS DOUBLE) AS lang_entropy
      |FROM e GROUP BY source""".stripMargin) { (s, d) =>
    val c = T.documents(s, d)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
    val t = c.groupBy(col("source")).agg(sum(col("n")).cast("long").as("tot"))
    val p = col("n").cast("double") / col("tot").cast("double")
    c.join(broadcast(t), Seq("source"))
      .withColumn("term", (-p * log(p)).cast("decimal(10,7)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_langs"),
        min(col("tot")).cast("long").as("n_docs"),
        sum(col("term")).cast("double").as("lang_entropy"))
  }

  // --- t27_linear_score: model scoring at corpus scale — a linear
  // classifier over t17's hashed bag-of-words features (the fastText-
  // style quality-gate shape: hashed n-gram features × a weight vector).
  // Weights are deterministic md5-derived integers in [-500, 500] (a
  // trained model would land as a tiny table the same way), so the
  // feature×weight contraction Σ tf_b·w_b is EXACT integer arithmetic;
  // only the final length-normalized score is double, identical
  // expression shape both engines. Scale shape: the weight table is
  // 16 rows (a real vocab-hashed model is ≤ millions — still broadcast-
  // sized), scoring is one partial-aggregated groupBy per doc — the
  // corpus never shuffles its text, and there is no UDF: the whole
  // model application is codegen'd column arithmetic. ---
  val t27LinearScore = QueryDef.sql(
    "t27_linear_score",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS t FROM documents),
       |f AS (SELECT doc_id, substr(md5(t), 1, 1) AS b, count(*) AS cnt
       |      FROM tok GROUP BY doc_id, b),
       |w AS (SELECT b,
       |        CAST(concat('0x', substr(md5('w:' || b), 1, 4)) AS BIGINT) % 1001 - 500 AS wq
       |      FROM (SELECT DISTINCT b FROM f) bs),
       |sc AS (SELECT f.doc_id,
       |         CAST(sum(f.cnt * w.wq) AS BIGINT) AS swq,
       |         CAST(sum(f.cnt) AS BIGINT) AS n_tokens
       |       FROM f JOIN w USING (b) GROUP BY f.doc_id)
       |SELECT doc_id, n_tokens, swq,
       |  CAST(swq AS DOUBLE) / (500.0 * CAST(n_tokens AS DOUBLE)) AS score,
       |  swq > 0 AS flagged
       |FROM sc""".stripMargin) { (s, d) =>
    val tok = T.documents(s, d)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
    val f = tok
      .groupBy(col("doc_id"), substring(md5(col("t")), 1, 1).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val w = f.select(col("b")).distinct()
      .withColumn("wq",
        expr("CAST(conv(substring(md5(concat('w:', b)), 1, 4), 16, 10) AS BIGINT) % 1001 - 500"))
    f.join(broadcast(w), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("wq")).as("swq"), sum(col("cnt")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("swq"),
        (col("swq").cast("double") / (lit(500.0) * col("n_tokens").cast("double"))).as("score"),
        (col("swq") > 0).as("flagged"))
  }

  // --- t28_bm25: BM25 ranked retrieval (k1=1.2, b=0.75) — the standard
  // relevance scorer for corpus search / decontamination triage, with
  // the length normalization tf-idf (t19) lacks. Inputs are four
  // partial-aggregated integer aggregates (per-doc term counts for the
  // query terms only, per-term doc frequency, per-doc length, corpus
  // totals); N and avgdl broadcast as a 1-row frame; the score is
  // double with the IDENTICAL expression shape both engines (0.25/0.75
  // are exact binary fractions, so 1-b+b·dl/avgdl carries no rounding
  // ambiguity), ties broken by doc_id. Scale: the corpus shuffles only
  // (doc_id,term) pairs for the 5 probe terms — document text never
  // moves — and the per-term top-10 window is partitioned by term. ---
  val t28Bm25 = QueryDef.sql(
    "t28_bm25",
    s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS t FROM documents),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS ntok FROM tok),
       |stats AS (SELECT n, CAST(ntok AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl FROM nn, tot),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
       |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM tok
       |       WHERE t IN ('spark', 'hash', 'window', 'vector', 'stream')
       |       GROUP BY doc_id, t),
       |dfx AS (SELECT t, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY t)
       |SELECT term, doc_id, score, rank FROM (
       |  SELECT tf.t AS term, tf.doc_id,
       |    ln(1.0 + (CAST(n AS DOUBLE) - CAST(dfc AS DOUBLE) + 0.5) / (CAST(dfc AS DOUBLE) + 0.5))
       |      * (CAST(c AS DOUBLE) * 2.2)
       |      / (CAST(c AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS score,
       |    row_number() OVER (PARTITION BY tf.t ORDER BY
       |      ln(1.0 + (CAST(n AS DOUBLE) - CAST(dfc AS DOUBLE) + 0.5) / (CAST(dfc AS DOUBLE) + 0.5))
       |        * (CAST(c AS DOUBLE) * 2.2)
       |        / (CAST(c AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)) DESC,
       |      tf.doc_id) AS rank
       |  FROM tf JOIN dfx USING (t) JOIN dl USING (doc_id), stats) s
       |WHERE rank <= 10""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val terms = Seq("spark", "hash", "window", "vector", "stream")
    val tok = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = tok.agg(count(lit(1)).as("ntok")).crossJoin(docs.agg(count(lit(1)).as("n")))
      .select(col("n"), (col("ntok").cast("double") / col("n").cast("double")).as("avgdl"))
    val tf = tok.filter(col("t").isin(terms: _*))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    val dfx = tf.groupBy(col("t")).agg(count(lit(1)).as("dfc"))
    val score =
      log(lit(1.0) + (col("n").cast("double") - col("dfc").cast("double") + lit(0.5)) /
          (col("dfc").cast("double") + lit(0.5))) *
        (col("c").cast("double") * lit(2.2)) /
        (col("c").cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl")))
    val w = Window.partitionBy(col("t")).orderBy(score.desc, col("doc_id"))
    tf.join(dfx, Seq("t")).join(dl, Seq("doc_id")).crossJoin(broadcast(stats))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("t").as("term"), col("doc_id"), col("score"), col("rank"))
  }

  // --- t29_boilerplate: template/boilerplate span detection — the
  // C4/RefinedWeb-style "strip the shared chrome" pass, expressed on
  // shingles since the fixture has no line structure. A 3-gram shingle
  // that appears in ≥4 DISTINCT sources is template text (navigation,
  // legal footers, injected ads — anything that repeats ACROSS sites is
  // not content); each doc reports how much of it is boilerplate. Plan:
  // the (shingle, source) projection is deduped BEFORE the per-shingle
  // source count (partial-agg on 8-byte hashed keys), the boilerplate
  // set broadcasts back onto the per-doc probe, and the per-doc ratio is
  // one double division of two exact counts. At 100 TB the only
  // corpus-scale shuffle is the shingle dedup — the boilerplate
  // dictionary itself stays dimension-sized by construction (it must
  // repeat across sources to qualify). Strings are hashed to longs
  // Spark-side; the string-keyed oracle doubles as the collision check
  // (d2's argument). ---
  val t29Boilerplate = QueryDef.sql(
    "t29_boilerplate",
    s"""WITH sh AS (SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, source, $sqlToks AS t FROM documents) toks,
       |  LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
       |boiler AS (SELECT s FROM (SELECT DISTINCT s, source FROM sh) ss
       |           GROUP BY s HAVING count(*) >= 4)
       |SELECT sh.doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN boiler.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  CAST(CAST(sum(CASE WHEN boiler.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |    / count(*) AS boiler_ratio
       |FROM sh LEFT JOIN boiler ON sh.s = boiler.s
       |GROUP BY sh.doc_id""".stripMargin) { (s, d) =>
    val sh = T.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(array_distinct(TextFns.shinglesRegex(col("text"), 3))).as("str"))
      .select(col("doc_id"), col("source"), xxhash64(col("str")).as("s"))
    val boiler = sh.select(col("s"), col("source")).distinct()
      .groupBy(col("s")).agg(count(lit(1)).as("nsrc"))
      .filter(col("nsrc") >= 4)
      .select(col("s"))
    sh.select(col("doc_id"), col("s")).as("sh")
      .join(broadcast(boiler.withColumn("hit", lit(1))).as("b"),
        col("sh.s") === col("b.s"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n_shingles")).as("boiler_ratio"))
  }

  // --- t30_target_encode: LEAVE-ONE-OUT target encoding of the source
  // categorical against the n_chars label — the standard feature-prep
  // trick for high-cardinality categoricals, in its leakage-safe form
  // (each row's own label is subtracted from its category's sum) plus
  // the Bayesian-smoothed variant (m = 10 pseudo-observations of the
  // global mean) that production encoders use for thin categories.
  // Scale: one partial-aggregated groupBy(source) produces a
  // DIMENSION-SIZED aggregate that broadcasts back onto the fact scan —
  // the big side is never shuffled (the window-function formulation of
  // LOO would reshuffle the whole table by category; the broadcast-join
  // formulation is a map-side projection). Exactness: numerators and
  // denominators are exact integer/DECIMAL(38,0) arithmetic; only the
  // final ratio divides in double with one expression shape on both
  // engines; nullif guards the single-member-category division. ---
  val t30TargetEncode = QueryDef.sql(
    "t30_target_encode",
    """WITH agg AS (SELECT source, count(*) AS cnt,
      |    CAST(sum(n_chars) AS BIGINT) AS s
      |  FROM documents GROUP BY source),
      |g AS (SELECT count(*) AS gc, CAST(sum(n_chars) AS BIGINT) AS gs FROM documents)
      |SELECT d.doc_id, d.source, d.n_chars,
      |  CAST(a.s - d.n_chars AS DOUBLE) / nullif(a.cnt - 1, 0) AS loo_mean,
      |  CAST(CAST(a.s - d.n_chars AS DECIMAL(38,0)) * g.gc + 10 * CAST(g.gs AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(CAST(a.cnt - 1 + 10 AS DECIMAL(38,0)) * g.gc AS DOUBLE) AS loo_smooth
      |FROM documents d JOIN agg a USING (source), g""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val agg = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).cast("bigint").as("s"))
    val g = docs.agg(count(lit(1)).as("gc"), sum(col("n_chars")).cast("bigint").as("gs"))
    docs.join(broadcast(agg), Seq("source"))
      .crossJoin(broadcast(g))
      .select(col("doc_id"), col("source"), col("n_chars"),
        ((col("s") - col("n_chars")).cast("double") / nullif(col("cnt") - 1, lit(0)))
          .as("loo_mean"),
        (((col("s") - col("n_chars")).cast("decimal(38,0)") * col("gc")
          + lit(10) * col("gs").cast("decimal(38,0)")).cast("double")
          / ((col("cnt") - 1 + 10).cast("decimal(38,0)") * col("gc")).cast("double"))
          .as("loo_smooth"))
  }

  // --- t32_bigram_logprob: bigram language-model scoring — the
  // perplexity-style quality filter (CCNet's recipe) t11's unigram
  // model can't express: P(w2|w1) with add-one smoothing over the
  // continuation vocabulary, trained on the 80% doc split and scoring
  // the held-out 20% per document. Exactness: every ln() term is
  // quantized to DECIMAL(10,6) BEFORE the per-doc sum (t11/c3's
  // discipline — decimal addition is order-independent where double
  // addition is not), so the gate hashes bit-for-bit. Scale shape:
  // training counts are two partial-aggregated shuffles ((w1,w2) then
  // w1), the vocabulary size is a 1-row broadcast, and the test side
  // joins the count tables on their natural keys — per-token work,
  // no per-doc state, no windows. ---
  val t32BigramLogprob = QueryDef.sql(
    "t32_bigram_logprob",
    s"""WITH bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) toks,
       |  LATERAL (SELECT unnest(range(1, len(t))) AS i) r),
       |trbg AS (SELECT w1, w2, count(*) AS c12 FROM bg WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
       |tru AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM trbg GROUP BY w1),
       |voc AS (SELECT count(DISTINCT w2) AS vv FROM trbg),
       |te AS (SELECT doc_id, w1, w2 FROM bg WHERE doc_id % 5 = 0),
       |terms AS (SELECT te.doc_id,
       |    CAST(ln((CAST(coalesce(tb.c12, 0) AS DOUBLE) + 1) / (coalesce(tu.c1, 0) + voc.vv))
       |      AS DECIMAL(10,6)) AS l
       |  FROM te LEFT JOIN trbg tb ON tb.w1 = te.w1 AND tb.w2 = te.w2
       |       LEFT JOIN tru tu ON tu.w1 = te.w1, voc)
       |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(l) AS DOUBLE) AS logprob,
       |  CAST(sum(l) AS DOUBLE) / count(*) AS avg_logprob
       |FROM terms GROUP BY doc_id""".stripMargin) { (s, d) =>
    val bg = T.documents(s, d)
      .select(col("doc_id"), explode(TextFns.shinglesRegex(col("text"), 2)).as("ngram"))
      .select(col("doc_id"),
        element_at(split(col("ngram"), " "), 1).as("w1"),
        element_at(split(col("ngram"), " "), 2).as("w2"))
    val trbg = bg.filter(col("doc_id") % 5 =!= 0)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val tru = trbg.groupBy(col("w1")).agg(sum(col("c12")).cast("bigint").as("c1"))
    val voc = trbg.agg(countDistinct(col("w2")).as("vv"))
    bg.filter(col("doc_id") % 5 === 0)
      .join(trbg, Seq("w1", "w2"), "left")
      .join(tru, Seq("w1"), "left")
      .crossJoin(broadcast(voc))
      .select(col("doc_id"),
        log((coalesce(col("c12"), lit(0L)).cast("double") + 1)
          / (coalesce(col("c1"), lit(0L)) + col("vv")))
          .cast("decimal(10,6)").as("l"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("l")).cast("double").as("logprob"),
        (sum(col("l")).cast("double") / count(lit(1))).as("avg_logprob"))
  }

  // --- t33_corpus_pipeline: the END-TO-END corpus-preparation
  // composite — quality gate → exact dedup (first-wins) → eval-set
  // contamination screen → per-language mix report, the full RefinedWeb/
  // FineWeb pipeline shape in ONE declarative plan (each stage exists
  // standalone as t2/d1/d5; this registers their COMPOSITION, where the
  // real bugs live: a doc must be dropped by the FIRST stage that
  // rejects it and counted exactly once). Stage semantics are all-
  // integer: quality = n_tokens ≥ 20 AND n_chars ≤ 12·n_tokens (mean
  // token length by exact cross-multiplication, no division); dedup
  // keeper = min(doc_id) per md5 fingerprint AMONG quality-passers
  // (a rejected doc must not steal keeper-ship); contamination = any
  // distinct 3-shingle shared with the eval fold (doc_id % 97 = 0 —
  // excluded from the corpus up front), evaluated only for docs still
  // alive after dedup. Scale: one fingerprint shuffle (8-byte md5
  // prefix at 100 TB), the eval shingle universe broadcasts (d5's
  // argument), shingles hash to longs Spark-side with the string-keyed
  // oracle as the collision check (d2's discipline), and the final
  // report is a |langs|-row aggregate. ---
  val t33CorpusPipeline = QueryDef.sql(
    "t33_corpus_pipeline",
    s"""WITH base AS (SELECT doc_id, lang, n_chars,
       |    len($sqlToks) AS n_tokens, md5($sqlWsCollapsed) AS fp
       |  FROM documents),
       |tr AS (SELECT * FROM base WHERE doc_id % 97 <> 0),
       |q AS (SELECT *, (n_tokens >= 20 AND n_chars <= 12 * n_tokens) AS q_ok FROM tr),
       |firsts AS (SELECT fp, min(doc_id) AS keeper FROM q WHERE q_ok GROUP BY fp),
       |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) toks,
       |  LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
       |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
       |contam AS (SELECT DISTINCT sh.doc_id FROM sh JOIN ev ON sh.s = ev.s
       |  WHERE sh.doc_id % 97 <> 0),
       |flags AS (SELECT q.doc_id, q.lang, q.n_tokens, q.q_ok,
       |    (f.keeper IS NOT NULL AND f.keeper = q.doc_id) AS is_first,
       |    (c.doc_id IS NOT NULL) AS has_contam
       |  FROM q LEFT JOIN firsts f ON f.fp = q.fp
       |         LEFT JOIN contam c ON c.doc_id = q.doc_id)
       |SELECT lang,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(*) FILTER (WHERE NOT q_ok) AS BIGINT) AS dropped_quality,
       |  CAST(count(*) FILTER (WHERE q_ok AND NOT is_first) AS BIGINT) AS dropped_dup,
       |  CAST(count(*) FILTER (WHERE q_ok AND is_first AND has_contam) AS BIGINT)
       |    AS dropped_contam,
       |  CAST(count(*) FILTER (WHERE q_ok AND is_first AND NOT has_contam) AS BIGINT)
       |    AS kept,
       |  CAST(sum(CASE WHEN q_ok AND is_first AND NOT has_contam
       |    THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM flags GROUP BY lang""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    val docs = T.documents(s, d)
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"),
      md5(expr("trim(regexp_replace(text, '\\\\s+', ' '))")).as("fp"))
    val tr = base.filter(col("doc_id") % 97 =!= 0)
    val q = tr.withColumn("q_ok",
      col("n_tokens") >= 20 && col("n_chars") <= lit(12) * col("n_tokens"))
    val firsts = q.filter(col("q_ok"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
    val sh = docs.select(col("doc_id"),
        explode(array_distinct(TextFns.shinglesRegex(col("text"), 3))).as("str"))
      .select(col("doc_id"), xxhash64(col("str")).as("s"))
    val ev = sh.filter(col("doc_id") % 97 === 0).select(col("s")).distinct()
    val contam = sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(ev), Seq("s"))
      .select(col("doc_id")).distinct()
      .withColumn("hit", lit(1))
    val flags = q
      .join(firsts, Seq("fp"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("lang"), col("n_tokens"), col("q_ok"),
        (col("keeper").isNotNull && col("keeper") === col("doc_id")).as("is_first"),
        col("hit").isNotNull.as("has_contam"))
    flags.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      count(when(!col("q_ok"), 1)).as("dropped_quality"),
      count(when(col("q_ok") && !col("is_first"), 1)).as("dropped_dup"),
      count(when(col("q_ok") && col("is_first") && col("has_contam"), 1))
        .as("dropped_contam"),
      count(when(col("q_ok") && col("is_first") && !col("has_contam"), 1)).as("kept"),
      sum(when(col("q_ok") && col("is_first") && !col("has_contam"),
        col("n_tokens")).otherwise(0L)).as("kept_tokens"))
  }

  // --- t34_length_batching: LENGTH-BUCKETED training-batch assembly —
  // the batching step after t8's packing: group documents into batches
  // of 8 WITHIN 64-token length buckets (so a batch pads to its own
  // max, not the corpus max) and account the padding efficiency per
  // batch — the number a training-infra team actually watches (padding
  // is pure wasted FLOPs; bucketing is why). Deterministic assembly:
  // docs order by doc_id within bucket, batch = (rank−1)/8; per batch
  // the padded cost is max_len·n_docs (dynamic per-batch padding).
  // Exact integers end-to-end, one double division for the waste
  // ratio. Scale: the window partitions by BUCKET (bounded: ≤16
  // buckets at the 1024 cap) ordered by doc_id — at corpus scale the
  // per-bucket ordering runs on a36's two-pass range-partition
  // machinery; the per-batch aggregate partial-aggregates. ---
  val t34LengthBatching = QueryDef.sql(
    "t34_length_batching",
    s"""WITH d AS (SELECT doc_id, len($sqlToks) AS n_tokens FROM documents),
       |b AS (SELECT doc_id, n_tokens,
       |    least(((n_tokens + 63) // 64) * 64, 1024) AS bucket FROM d),
       |r AS (SELECT doc_id, n_tokens, bucket,
       |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM b),
       |g AS (SELECT bucket, (rn - 1) // 8 AS batch_id,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS used_tokens,
       |    CAST(max(n_tokens) AS BIGINT) AS max_len
       |  FROM r GROUP BY bucket, (rn - 1) // 8)
       |SELECT bucket, batch_id, n_docs, used_tokens, max_len,
       |  max_len * n_docs AS padded_tokens,
       |  1.0 - CAST(used_tokens AS DOUBLE) / (max_len * n_docs) AS pad_waste
       |FROM g""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    val docs = T.documents(s, d)
      .select(col("doc_id"), size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
    val b = docs.withColumn("bucket",
      least(floor((col("n_tokens") + 63) / 64) * 64, lit(1024L)))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    val r = b.withColumn("rn", row_number().over(w))
      .withColumn("batch_id", floor((col("rn") - 1) / 8))
    r.groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("used_tokens"),
        max(col("n_tokens")).as("max_len"))
      .select(col("bucket"), col("batch_id"), col("n_docs"), col("used_tokens"),
        col("max_len"),
        (col("max_len") * col("n_docs")).as("padded_tokens"),
        (lit(1.0) - col("used_tokens").cast("double") /
          (col("max_len") * col("n_docs"))).as("pad_waste"))
  }

  // --- t35_bpe_merges: BPE-style MERGE TRAINING over the corpus — the
  // tokenizer-training shape (learn the most frequent adjacent pair,
  // fuse it everywhere, repeat), run for 3 rounds at the WORD level
  // (word-piece style on whitespace tokens). The one semantic
  // restriction that makes this exactly recomputable by a declarative
  // oracle: only pairs with a ≠ b are merge candidates, so no two
  // matches can share a position (overlap needs t[i+1] = t[i]) and the
  // greedy left-to-right application collapses to a pure join+filter —
  // no sequential scan, no per-row state. Each round: adjacent-pair
  // counts (one partial-aggregated shuffle of (t1,t2) pairs), a 1-row
  // argmax broadcast (count desc, pair lexicographic tie-break), fuse
  // matched positions / keep rows that are neither a match start nor a
  // consumed successor, re-rank positions with a per-doc window. The
  // gate pins all 3 learned merges, their support, and the corpus
  // token count after each round. Scale: per round two equi-joins on
  // (doc, position) and one bounded window per doc; deeper runs stage
  // the sequence table per round (PageRank's restaging discipline). ---
  val t35BpeMerges = QueryDef.sql(
    "t35_bpe_merges",
    s"""WITH seq0 AS (SELECT doc_id, i, t[i] AS t FROM
       |    (SELECT doc_id, $sqlToks AS t FROM documents) d,
       |    LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) r),
       |p0 AS (SELECT s1.doc_id, s1.i, s1.t AS t1, s2.t AS t2 FROM seq0 s1
       |       JOIN seq0 s2 ON s2.doc_id = s1.doc_id AND s2.i = s1.i + 1),
       |c0 AS (SELECT t1, t2, count(*) AS c FROM p0 WHERE t1 <> t2 GROUP BY t1, t2),
       |m0 AS (SELECT t1 AS a, t2 AS b, c FROM c0 ORDER BY c DESC, t1, t2 LIMIT 1),
       |x0 AS (SELECT p.doc_id, p.i, m.a || ' ' || m.b AS t
       |       FROM p0 p, m0 m WHERE p.t1 = m.a AND p.t2 = m.b),
       |k0 AS (SELECT s.doc_id, s.i, s.t FROM seq0 s
       |       LEFT JOIN x0 a ON a.doc_id = s.doc_id AND a.i = s.i
       |       LEFT JOIN x0 b ON b.doc_id = s.doc_id AND b.i = s.i - 1
       |       WHERE a.i IS NULL AND b.i IS NULL),
       |seq1 AS (SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i, t
       |         FROM (SELECT * FROM x0 UNION ALL SELECT * FROM k0) u),
       |p1 AS (SELECT s1.doc_id, s1.i, s1.t AS t1, s2.t AS t2 FROM seq1 s1
       |       JOIN seq1 s2 ON s2.doc_id = s1.doc_id AND s2.i = s1.i + 1),
       |c1 AS (SELECT t1, t2, count(*) AS c FROM p1 WHERE t1 <> t2 GROUP BY t1, t2),
       |m1 AS (SELECT t1 AS a, t2 AS b, c FROM c1 ORDER BY c DESC, t1, t2 LIMIT 1),
       |x1 AS (SELECT p.doc_id, p.i, m.a || ' ' || m.b AS t
       |       FROM p1 p, m1 m WHERE p.t1 = m.a AND p.t2 = m.b),
       |k1 AS (SELECT s.doc_id, s.i, s.t FROM seq1 s
       |       LEFT JOIN x1 a ON a.doc_id = s.doc_id AND a.i = s.i
       |       LEFT JOIN x1 b ON b.doc_id = s.doc_id AND b.i = s.i - 1
       |       WHERE a.i IS NULL AND b.i IS NULL),
       |seq2 AS (SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i, t
       |         FROM (SELECT * FROM x1 UNION ALL SELECT * FROM k1) u),
       |p2 AS (SELECT s1.doc_id, s1.i, s1.t AS t1, s2.t AS t2 FROM seq2 s1
       |       JOIN seq2 s2 ON s2.doc_id = s1.doc_id AND s2.i = s1.i + 1),
       |c2 AS (SELECT t1, t2, count(*) AS c FROM p2 WHERE t1 <> t2 GROUP BY t1, t2),
       |m2 AS (SELECT t1 AS a, t2 AS b, c FROM c2 ORDER BY c DESC, t1, t2 LIMIT 1),
       |x2 AS (SELECT p.doc_id, p.i, m.a || ' ' || m.b AS t
       |       FROM p2 p, m2 m WHERE p.t1 = m.a AND p.t2 = m.b),
       |k2 AS (SELECT s.doc_id, s.i, s.t FROM seq2 s
       |       LEFT JOIN x2 a ON a.doc_id = s.doc_id AND a.i = s.i
       |       LEFT JOIN x2 b ON b.doc_id = s.doc_id AND b.i = s.i - 1
       |       WHERE a.i IS NULL AND b.i IS NULL),
       |n1 AS (SELECT count(*) AS n FROM seq1),
       |n2 AS (SELECT count(*) AS n FROM seq2),
       |n3 AS (SELECT count(*) + (SELECT count(*) FROM k2) AS n FROM x2)
       |SELECT 1 AS round, a, b, c AS pair_count,
       |  CAST((SELECT n FROM n1) AS BIGINT) AS tokens_after FROM m0
       |UNION ALL
       |SELECT 2, a, b, c, CAST((SELECT n FROM n2) AS BIGINT) FROM m1
       |UNION ALL
       |SELECT 3, a, b, c, CAST((SELECT n FROM n3) AS BIGINT) FROM m2""".stripMargin) {
    (s, d) =>
    import graft.functions.TextFns
    // every round's sequence AND 1-row merge table are parquet-staged
    // (PageRank's restaging discipline): without the stage each round's
    // several self-joins re-derive the whole prior chain multiplicatively
    // (measured 89 s → 5 s at sf0.1); with it each round is a bounded
    // number of linear passes over the staged table
    val stageRoot = graft.Scratch.dir("t35-bpe")
    def stage(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$stageRoot/$name")
      s.read.parquet(s"$stageRoot/$name")
    }
    val seq0 = stage(
      T.documents(s, d)
        .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))).as(Seq("i0", "t")))
        .select(col("doc_id"), (col("i0") + 1).as("i"), col("t")),
      "seq0")

    def adjacent(seq: DataFrame): DataFrame =
      seq.select(col("doc_id"), col("i"), col("t").as("t1"))
        .join(seq.select(col("doc_id"), (col("i") - 1).as("i"), col("t").as("t2")),
          Seq("doc_id", "i"))

    def round(r: Int, seq: DataFrame): (DataFrame, DataFrame) = {
      val p = adjacent(seq)
      val m = stage(
        p.filter(col("t1") =!= col("t2"))
          .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("t1"), col("t2")).limit(1)
          .select(col("t1").as("a"), col("t2").as("b"), col("c"))
          .coalesce(1),
        s"m$r")
      val x = p.join(broadcast(m), col("t1") === col("a") && col("t2") === col("b"))
        .select(col("doc_id"), col("i"), concat(col("a"), lit(" "), col("b")).as("t"))
      val starts = x.select(col("doc_id"), col("i").as("xi"))
      val kept = seq
        .join(starts.withColumnRenamed("xi", "i").withColumn("hitA", lit(1)),
          Seq("doc_id", "i"), "left")
        .join(starts.select(col("doc_id"), (col("xi") + 1).as("i"))
          .withColumn("hitB", lit(1)), Seq("doc_id", "i"), "left")
        .filter(col("hitA").isNull && col("hitB").isNull)
        .select(col("doc_id"), col("i"), col("t"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val next = stage(
        x.unionByName(kept)
          .withColumn("ni", row_number().over(w))
          .select(col("doc_id"), col("ni").as("i"), col("t")),
        s"seq$r")
      (m, next)
    }

    val (m0, seq1) = round(1, seq0)
    val (m1, seq2) = round(2, seq1)
    val (m2, seq3) = round(3, seq2)
    def report(r: Int, m: DataFrame, after: DataFrame): DataFrame =
      m.withColumn("round", lit(r))
        .crossJoin(broadcast(after.agg(count(lit(1)).as("tokens_after"))))
        .select(col("round"), col("a"), col("b"), col("c").as("pair_count"),
          col("tokens_after"))
    report(1, m0, seq1).unionByName(report(2, m1, seq2))
      .unionByName(report(3, m2, seq3))
  }

  // --- t39_bpe_encode: BPE APPLY — the other half of the tokenizer
  // t35 only TRAINS. Merges are learned on the TRAINING slice
  // (doc_id % 5 ≠ 0: each round's pair counts and argmax see train
  // docs only) and applied in rank order to the HELD-OUT slice
  // (doc_id % 5 = 0) — the exact shape of encoding a new corpus with a
  // frozen tokenizer, and the train/held-out split means the gate
  // proves the merge TABLE transfers, not just that training converges.
  // One sequence table carries both slices (fusing is the same
  // join+filter everywhere; only the counting is sliced), so apply
  // costs nothing beyond t35's per-round discipline: two equi-joins on
  // (doc, position), a 1-row broadcast merge, a per-doc window, rounds
  // restaged to parquet. Output: per held-out doc, token count before
  // and after the 3 learned merges and how many merges landed — the
  // per-document compression the tokenizer-parity dashboards track.
  // The a ≠ b candidate restriction (t35's) keeps greedy application
  // overlap-free, so the unrolled SQL oracle replays it exactly. ---
  // --- t40_dsir: Data Selection via Importance Resampling (the hashed
  // n-gram importance-weighting scheme of Xie et al. 2023, NeurIPS —
  // "DSIR"): score every raw document by how target-like its hashed
  // unigram profile is. Target = the English slice of the corpus; raw =
  // the whole corpus. Features hash into 256 md5 buckets (t17's hex-
  // prefix trick — both engines agree with zero conversions); bucket
  // distributions get +1 Laplace smoothing; a document's weight is
  // Σ_b cnt_db · ln(p̂_b/q̂_b). Oracle parity: each bucket's log-ratio
  // is quantized to DECIMAL(12,7) BEFORE the per-doc weighted sum
  // (t11's discipline), so the sum is exact integer·decimal arithmetic
  // — order-independent and immune to libm ulp drift. Scale shape: one
  // explode + one (doc,bucket) partial-aggregated shuffle; the bucket
  // stats are 256 rows (broadcast), the totals one row (broadcast);
  // selection is a stateless per-row threshold (weight > 0 ⇔ more
  // target-like than corpus-average), NOT a global sort — at 100 TB the
  // resampling step reads the weight column and never ranks globally. ---
  val t40Dsir = QueryDef.sql(
    "t40_dsir",
    s"""WITH toks AS (SELECT doc_id, lang, unnest($sqlToks) AS t FROM documents),
       |db AS (SELECT doc_id, lang, substr(md5(t), 1, 2) AS b, count(*) AS cnt
       |  FROM toks GROUP BY doc_id, lang, b),
       |ab AS (SELECT b, sum(cnt) AS ca FROM db GROUP BY b),
       |tb AS (SELECT b, sum(cnt) AS ct FROM db WHERE lang = 'en' GROUP BY b),
       |tot AS (SELECT sum(cnt) AS ta,
       |    sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS tt FROM db),
       |lr AS (SELECT ab.b,
       |    CAST(ln((CAST(coalesce(ct, 0) + 1 AS DOUBLE) * CAST(ta + 256 AS DOUBLE)) /
       |            (CAST(ca + 1 AS DOUBLE) * CAST(tt + 256 AS DOUBLE))) AS DECIMAL(12,7)) AS lr
       |  FROM ab LEFT JOIN tb USING (b), tot)
       |SELECT doc_id, lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |  CAST(sum(cnt * lr) AS DOUBLE) AS dsir_weight,
       |  CAST(CAST(sum(cnt * lr) AS DOUBLE) > 0 AS INT) AS sel
       |FROM db JOIN lr USING (b)
       |GROUP BY doc_id, lang""".stripMargin) { (s, d) =>
    val toks = T.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(TextFns.tokens(col("text"))).as("t"))
    val db = toks
      .groupBy(col("doc_id"), col("lang"), substring(md5(col("t")), 1, 2).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val ab = db.groupBy(col("b")).agg(sum(col("cnt")).as("ca"))
    val tb = db.filter(col("lang") === "en").groupBy(col("b")).agg(sum(col("cnt")).as("ct"))
    val tot = db.agg(sum(col("cnt")).as("ta"),
      sum(when(col("lang") === "en", col("cnt")).otherwise(lit(0))).as("tt"))
    val lr = ab.join(tb, Seq("b"), "left").join(broadcast(tot))
      .withColumn("lr", log(
        ((coalesce(col("ct"), lit(0)) + 1).cast("double") * (col("ta") + 256).cast("double")) /
          ((col("ca") + 1).cast("double") * (col("tt") + 256).cast("double"))).cast("decimal(12,7)"))
      .select(col("b"), col("lr"))
    db.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("lr")).cast("double").as("dsir_weight"))
      .withColumn("sel", (col("dsir_weight") > 0).cast("int"))
  }

  // --- t41_ngram_novelty: first-occurrence novelty — per document, the
  // fraction of its distinct token trigrams whose FIRST corpus
  // occurrence (min doc_id — in production, min ingest sequence) is
  // this document. The curation dial between d-family dedup (is this a
  // copy?) and mixing (t13/t16): novelty ≈ 0 marks documents that only
  // restate earlier corpus content even when no single source matches
  // (boilerplate recombination), novelty ≈ 1 marks genuinely new text.
  // Two partial-aggregated shuffles — distinct (doc, trigram), then
  // the trigram→min(doc) first-occurrence table joined back — the
  // same shape as t9's n-gram stats, so it scales exactly as far. ---
  val t41NgramNovelty = QueryDef.sql(
    "t41_ngram_novelty",
    s"""WITH sh AS (SELECT DISTINCT doc_id, g FROM (
       |    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
       |    FROM (SELECT doc_id, $sqlToks AS t FROM documents) toks,
       |    LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r) x),
       |firsts AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g)
       |SELECT sh.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(count(*) FILTER (WHERE first_doc = sh.doc_id) AS BIGINT) AS n_novel,
       |  CAST(count(*) FILTER (WHERE first_doc = sh.doc_id) AS DOUBLE) / count(*) AS novelty
       |FROM sh JOIN firsts USING (g)
       |GROUP BY sh.doc_id""".stripMargin) { (s, d) =>
    val sh = T.documents(s, d)
      .select(col("doc_id"), explode(TextFns.shinglesRegex(col("text"), 3)).as("g"))
      .distinct()
    val firsts = sh.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(firsts, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("first_doc") === col("doc_id"), lit(1))).as("n_novel"),
        (count(when(col("first_doc") === col("doc_id"), lit(1))).cast("double")
          / count(lit(1))).as("novelty"))
  }

  // --- t42_chat_template: SFT chat-template rendering with loss-mask
  // accounting — the step that turns curated documents into
  // instruction-tuning examples: split each document into a prompt
  // (first sentence) and completion, render the chat markup
  // (<|system|>…<|user|>…<|assistant|>…), and count EXACTLY which
  // tokens are loss-masked (markers + system + prompt) vs trained on
  // (completion) plus a context-budget fit flag — the numbers a packing
  // stage (t8/t34) consumes and a data card (t25) reports. Pure
  // per-row string expressions — no shuffle at all; the whole operator
  // is a codegen'd projection at any corpus size. Determinism: both
  // engines split on the same collapsed whitespace and the same
  // 1-based character positions. ---
  val t42ChatTemplate = QueryDef.sql(
    "t42_chat_template",
    s"""WITH p0 AS (SELECT doc_id, text, instr(text, '. ') AS pos FROM documents),
       |pc AS (SELECT doc_id,
       |    CASE WHEN pos > 0 THEN substr(text, 1, pos) ELSE text END AS prompt,
       |    CASE WHEN pos > 0 THEN substr(text, pos + 2) ELSE '' END AS completion
       |  FROM p0),
       |tk AS (SELECT doc_id, prompt, completion,
       |    len(string_split(trim(regexp_replace(prompt, '\\s+', ' ', 'g')), ' ')) AS npt,
       |    CASE WHEN completion = '' THEN 0
       |         ELSE len(string_split(trim(regexp_replace(completion, '\\s+', ' ', 'g')), ' ')) END AS nct
       |  FROM pc)
       |SELECT doc_id,
       |  length('<|system|>You are a helpful assistant.<|user|>' || prompt
       |    || '<|assistant|>' || completion) AS rendered_len,
       |  CAST(npt AS BIGINT) AS n_prompt_tokens,
       |  CAST(nct AS BIGINT) AS n_completion_tokens,
       |  CAST(3 + 5 + npt AS BIGINT) AS n_masked,
       |  CAST(3 + 5 + npt + nct AS BIGINT) AS n_total,
       |  CAST(3 + 5 + npt + nct <= 128 AS INT) AS fits_context
       |FROM tk""".stripMargin) { (s, d) =>
    val pc = T.documents(s, d)
      .select(col("doc_id"), col("text"), instr(col("text"), ". ").as("pos"))
      .select(col("doc_id"),
        expr("CASE WHEN pos > 0 THEN substring(text, 1, pos) ELSE text END").as("prompt"),
        expr("CASE WHEN pos > 0 THEN substring(text, pos + 2) ELSE '' END").as("completion"))
    val tk = pc
      .withColumn("npt", size(TextFns.tokens(col("prompt"))))
      .withColumn("nct", when(col("completion") === "", lit(0))
        .otherwise(size(TextFns.tokens(col("completion")))))
    tk.select(col("doc_id"),
      length(concat(lit("<|system|>You are a helpful assistant.<|user|>"),
        col("prompt"), lit("<|assistant|>"), col("completion"))).as("rendered_len"),
      col("npt").cast("bigint").as("n_prompt_tokens"),
      col("nct").cast("bigint").as("n_completion_tokens"),
      (lit(8) + col("npt")).cast("bigint").as("n_masked"),
      (lit(8) + col("npt") + col("nct")).cast("bigint").as("n_total"),
      ((lit(8) + col("npt") + col("nct")) <= 128).cast("int").as("fits_context"))
  }

  val t39BpeEncode = QueryDef.sql(
    "t39_bpe_encode",
    s"""WITH seq0 AS (SELECT doc_id, i, t[i] AS t FROM
       |    (SELECT doc_id, $sqlToks AS t FROM documents) d,
       |    LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) r),
       |p0 AS (SELECT s1.doc_id, s1.i, s1.t AS t1, s2.t AS t2 FROM seq0 s1
       |       JOIN seq0 s2 ON s2.doc_id = s1.doc_id AND s2.i = s1.i + 1),
       |c0 AS (SELECT t1, t2, count(*) AS c FROM p0
       |       WHERE t1 <> t2 AND doc_id % 5 <> 0 GROUP BY t1, t2),
       |m0 AS (SELECT t1 AS a, t2 AS b FROM c0 ORDER BY c DESC, t1, t2 LIMIT 1),
       |x0 AS (SELECT p.doc_id, p.i, m.a || ' ' || m.b AS t
       |       FROM p0 p, m0 m WHERE p.t1 = m.a AND p.t2 = m.b),
       |k0 AS (SELECT s.doc_id, s.i, s.t FROM seq0 s
       |       LEFT JOIN x0 a ON a.doc_id = s.doc_id AND a.i = s.i
       |       LEFT JOIN x0 b ON b.doc_id = s.doc_id AND b.i = s.i - 1
       |       WHERE a.i IS NULL AND b.i IS NULL),
       |seq1 AS (SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i, t
       |         FROM (SELECT * FROM x0 UNION ALL SELECT * FROM k0) u),
       |p1 AS (SELECT s1.doc_id, s1.i, s1.t AS t1, s2.t AS t2 FROM seq1 s1
       |       JOIN seq1 s2 ON s2.doc_id = s1.doc_id AND s2.i = s1.i + 1),
       |c1 AS (SELECT t1, t2, count(*) AS c FROM p1
       |       WHERE t1 <> t2 AND doc_id % 5 <> 0 GROUP BY t1, t2),
       |m1 AS (SELECT t1 AS a, t2 AS b FROM c1 ORDER BY c DESC, t1, t2 LIMIT 1),
       |x1 AS (SELECT p.doc_id, p.i, m.a || ' ' || m.b AS t
       |       FROM p1 p, m1 m WHERE p.t1 = m.a AND p.t2 = m.b),
       |k1 AS (SELECT s.doc_id, s.i, s.t FROM seq1 s
       |       LEFT JOIN x1 a ON a.doc_id = s.doc_id AND a.i = s.i
       |       LEFT JOIN x1 b ON b.doc_id = s.doc_id AND b.i = s.i - 1
       |       WHERE a.i IS NULL AND b.i IS NULL),
       |seq2 AS (SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i, t
       |         FROM (SELECT * FROM x1 UNION ALL SELECT * FROM k1) u),
       |p2 AS (SELECT s1.doc_id, s1.i, s1.t AS t1, s2.t AS t2 FROM seq2 s1
       |       JOIN seq2 s2 ON s2.doc_id = s1.doc_id AND s2.i = s1.i + 1),
       |c2 AS (SELECT t1, t2, count(*) AS c FROM p2
       |       WHERE t1 <> t2 AND doc_id % 5 <> 0 GROUP BY t1, t2),
       |m2 AS (SELECT t1 AS a, t2 AS b FROM c2 ORDER BY c DESC, t1, t2 LIMIT 1),
       |x2 AS (SELECT p.doc_id, p.i, m.a || ' ' || m.b AS t
       |       FROM p2 p, m2 m WHERE p.t1 = m.a AND p.t2 = m.b),
       |k2 AS (SELECT s.doc_id, s.i, s.t FROM seq2 s
       |       LEFT JOIN x2 a ON a.doc_id = s.doc_id AND a.i = s.i
       |       LEFT JOIN x2 b ON b.doc_id = s.doc_id AND b.i = s.i - 1
       |       WHERE a.i IS NULL AND b.i IS NULL),
       |seq3 AS (SELECT doc_id, i, t FROM x2 UNION ALL SELECT doc_id, i, t FROM k2),
       |bef AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tokens_before
       |        FROM seq0 WHERE doc_id % 5 = 0 GROUP BY doc_id),
       |aft AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tokens_after
       |        FROM seq3 WHERE doc_id % 5 = 0 GROUP BY doc_id)
       |SELECT b.doc_id, b.tokens_before, a.tokens_after,
       |  b.tokens_before - a.tokens_after AS merges_applied
       |FROM bef b JOIN aft a ON a.doc_id = b.doc_id""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    // t35's restaging discipline verbatim: every round's sequence and
    // 1-row merge table are parquet-staged so the 3-round lineage never
    // re-derives multiplicatively
    val stageRoot = graft.Scratch.dir("t39-bpe")
    def stage(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$stageRoot/$name")
      s.read.parquet(s"$stageRoot/$name")
    }
    val seq0 = stage(
      T.documents(s, d)
        .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))).as(Seq("i0", "t")))
        .select(col("doc_id"), (col("i0") + 1).as("i"), col("t")),
      "seq0")

    def adjacent(seq: DataFrame): DataFrame =
      seq.select(col("doc_id"), col("i"), col("t").as("t1"))
        .join(seq.select(col("doc_id"), (col("i") - 1).as("i"), col("t").as("t2")),
          Seq("doc_id", "i"))

    def round(r: Int, seq: DataFrame): DataFrame = {
      val p = adjacent(seq)
      // merge learned on the TRAIN slice only; applied everywhere
      val m = stage(
        p.filter(col("t1") =!= col("t2") && col("doc_id") % 5 =!= 0)
          .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("t1"), col("t2")).limit(1)
          .select(col("t1").as("a"), col("t2").as("b"))
          .coalesce(1),
        s"m$r")
      val x = p.join(broadcast(m), col("t1") === col("a") && col("t2") === col("b"))
        .select(col("doc_id"), col("i"), concat(col("a"), lit(" "), col("b")).as("t"))
      val starts = x.select(col("doc_id"), col("i").as("xi"))
      val kept = seq
        .join(starts.withColumnRenamed("xi", "i").withColumn("hitA", lit(1)),
          Seq("doc_id", "i"), "left")
        .join(starts.select(col("doc_id"), (col("xi") + 1).as("i"))
          .withColumn("hitB", lit(1)), Seq("doc_id", "i"), "left")
        .filter(col("hitA").isNull && col("hitB").isNull)
        .select(col("doc_id"), col("i"), col("t"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      stage(
        x.unionByName(kept)
          .withColumn("ni", row_number().over(w))
          .select(col("doc_id"), col("ni").as("i"), col("t")),
        s"seq$r")
    }

    val seq3 = round(3, round(2, round(1, seq0)))
    val held = col("doc_id") % 5 === 0
    val before = seq0.filter(held).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("tokens_before"))
    val after = seq3.filter(held).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("tokens_after"))
    before.join(after, Seq("doc_id"))
      .select(col("doc_id"), col("tokens_before"), col("tokens_after"),
        (col("tokens_before") - col("tokens_after")).as("merges_applied"))
  }

  // --- t36_span_decontaminate: SPAN-LEVEL eval-set excision — d5/t33
  // DROP whole contaminated documents; production decontamination (the
  // PaLM/Llama recipe) cuts only the overlapping SPANS and keeps the
  // rest of the document. Every training-doc 3-gram matching an eval
  // shingle defines a token interval [i, i+2]; overlapping intervals
  // merge into maximal excision spans via the gaps-and-islands pattern
  // (running max of span ends per doc: a new island starts where the
  // start position exceeds every previous end — e16's machinery on
  // text positions instead of timestamps). Output: per training doc,
  // spans cut, tokens removed/kept — all exact integers. Scale: eval
  // shingles broadcast (d5's argument), matches shuffle once per
  // (doc, position), islands windows partition BY DOC. ---
  val t36SpanDecontaminate = QueryDef.sql(
    "t36_span_decontaminate",
    s"""WITH toks AS (SELECT doc_id, i, t[i] AS tok, len(t) AS n FROM
       |    (SELECT doc_id, $sqlToks AS t FROM documents) d,
       |    LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) r),
       |sh AS (SELECT doc_id, i, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) d,
       |  LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
       |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
       |hits AS (SELECT sh.doc_id, sh.i AS b, sh.i + 2 AS e
       |  FROM sh JOIN ev ON sh.s = ev.s WHERE sh.doc_id % 97 <> 0),
       |isl AS (SELECT doc_id, b, e,
       |    CASE WHEN b > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS ns
       |  FROM hits),
       |grp AS (SELECT doc_id, b, e,
       |    sum(ns) OVER (PARTITION BY doc_id ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |  FROM isl),
       |spans AS (SELECT doc_id, g, min(b) AS b, max(e) AS e FROM grp GROUP BY doc_id, g),
       |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |    CAST(sum(e - b + 1) AS BIGINT) AS tokens_removed
       |  FROM spans GROUP BY doc_id),
       |dl AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens FROM toks
       |  WHERE doc_id % 97 <> 0 GROUP BY doc_id)
       |SELECT dl.doc_id, dl.n_tokens,
       |  coalesce(p.n_spans, 0) AS n_spans,
       |  coalesce(p.tokens_removed, 0) AS tokens_removed,
       |  dl.n_tokens - coalesce(p.tokens_removed, 0) AS tokens_kept,
       |  p.doc_id IS NULL AS clean
       |FROM dl LEFT JOIN per_doc p ON p.doc_id = dl.doc_id""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    val docs = T.documents(s, d)
    val sh = docs.select(col("doc_id"),
      posexplode(TextFns.shinglesRegex(col("text"), 3)).as(Seq("i0", "str")))
      .select(col("doc_id"), (col("i0") + 1).as("b"), col("str"))
    val ev = sh.filter(col("doc_id") % 97 === 0)
      .select(xxhash64(col("str")).as("h")).distinct()
    val hits = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), col("b"), xxhash64(col("str")).as("h"))
      .join(broadcast(ev), Seq("h"))
      .select(col("doc_id"), col("b"), (col("b") + 2).as("e"))
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = hits
      .withColumn("ns",
        when(col("b") > coalesce(max(col("e")).over(wPrev), lit(-1L)), 1).otherwise(0))
      .withColumn("g", sum(col("ns")).over(wRun))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("b")).as("b"), max(col("e")).as("e"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("b") + 1).as("tokens_removed"))
      .withColumn("hit", lit(1))
    docs.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        (col("n_tokens") - coalesce(col("tokens_removed"), lit(0L))).as("tokens_kept"),
        col("hit").isNull.as("clean"))
  }

  // --- t37_rake_keyphrases: RAKE keyphrase extraction (Rose et al.
  // 2010) — the unsupervised "what is this document about" primitive
  // (data cards, topic routing, retrieval expansion) built from three
  // shapes the engine already speaks: GAPS-AND-ISLANDS (candidate
  // phrases = maximal stopword-free token runs; island id = running
  // stopword count, per-doc window), per-doc word statistics
  // (freq(w) = occurrences in phrases, deg(w) = Σ length of phrases
  // containing the occurrence — co-occurrence degree), and phrase
  // score = Σ deg(w)/freq(w) over the phrase's occurrences, top-3 per
  // doc. Determinism: each word score deg/freq QUANTIZES to
  // DECIMAL(18,9) before the per-phrase sum (c5's transcendental rule
  // applied to division), so the sum is an exact order-independent
  // decimal and the rank tie-breaks on phrase text. The phrase-token
  // table stages once (three consumers; d6's discipline). Scale: all
  // joins key on (doc, island) or (doc, word) — partition-local after
  // one shuffle each; windows partition BY DOC. ---
  val t37RakeKeyphrases = QueryDef.sql(
    "t37_rake_keyphrases",
    s"""WITH tk AS (SELECT doc_id, i, t[i] AS tok
       |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) toks,
       |  LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) r),
       |isl AS (SELECT doc_id, i, tok,
       |    sum(CASE WHEN tok IN ('the', 'a') THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY i) AS island
       |  FROM tk),
       |pw AS MATERIALIZED (SELECT doc_id, island, i, tok FROM isl
       |  WHERE tok NOT IN ('the', 'a')),
       |ph AS MATERIALIZED (SELECT doc_id, island,
       |    string_agg(tok, ' ' ORDER BY i) AS phrase,
       |    CAST(count(*) AS BIGINT) AS n_words
       |  FROM pw GROUP BY doc_id, island),
       |ws AS (SELECT pw.doc_id, pw.tok,
       |    CAST(count(*) AS BIGINT) AS freq,
       |    CAST(sum(ph.n_words) AS BIGINT) AS deg
       |  FROM pw JOIN ph ON ph.doc_id = pw.doc_id AND ph.island = pw.island
       |  GROUP BY pw.doc_id, pw.tok),
       |sc AS (SELECT pw.doc_id, pw.island,
       |    sum(CAST(CAST(ws.deg AS DOUBLE) / ws.freq AS DECIMAL(18,9))) AS score
       |  FROM pw JOIN ws ON ws.doc_id = pw.doc_id AND ws.tok = pw.tok
       |  GROUP BY pw.doc_id, pw.island),
       |ranked AS (SELECT ph.doc_id, ph.phrase, ph.n_words,
       |    CAST(sc.score AS DOUBLE) AS score,
       |    row_number() OVER (PARTITION BY ph.doc_id
       |      ORDER BY sc.score DESC, ph.phrase) AS rnk
       |  FROM ph JOIN sc ON sc.doc_id = ph.doc_id AND sc.island = ph.island)
       |SELECT doc_id, phrase, n_words, score, rnk
       |FROM ranked WHERE rnk <= 3""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    val stopList = Seq("the", "a")
    val tk = T.documents(s, d)
      .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("tok"))
    val stop = col("tok").isin(stopList: _*)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val stage = graft.Scratch.dir("t37-pw")
    tk.withColumn("island", sum(when(stop, 1L).otherwise(0L)).over(w))
      .filter(!stop)
      .write.mode("overwrite").parquet(stage)
    val pw = s.read.parquet(stage) // three consumers below — staged once
    val ph = pw.groupBy(col("doc_id"), col("island"))
      .agg(sort_array(collect_list(struct(col("i"), col("tok")))).as("st"),
        count(lit(1)).as("n_words"))
      .select(col("doc_id"), col("island"), col("n_words"),
        expr("array_join(transform(st, x -> x.tok), ' ')").as("phrase"))
    val ws = pw.join(ph.select(col("doc_id"), col("island"), col("n_words")),
        Seq("doc_id", "island"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("deg"))
    val sc = pw.join(ws, Seq("doc_id", "tok"))
      .groupBy(col("doc_id"), col("island"))
      .agg(sum((col("deg").cast("double") / col("freq"))
        .cast("decimal(18,9)")).as("score"))
    val rw = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("phrase"))
    ph.join(sc, Seq("doc_id", "island"))
      .withColumn("rnk", row_number().over(rw))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("phrase"), col("n_words"),
        col("score").cast("double").as("score"), col("rnk"))
  }

  // --- t38_zipf_fit: rank-frequency (Zipf) law fit over the corpus
  // vocabulary — the one-number corpus-health diagnostic (natural text
  // sits near slope −1; a flat slope screams synthetic/templated data —
  // this fixture duly reports ≈ −0.18): ln f = α + β·ln r by OLS over
  // the full rank-frequency curve. Rank is the GLOBAL order by
  // (freq DESC, token) — computed with a36's two-pass machinery (range-
  // partitioned sort, per-partition counts, broadcast offsets), never a
  // partition-less window, so the vocab frame ranks in parallel at any
  // vocabulary size. Both logs quantize to DECIMAL(12,9) BEFORE the
  // sufficient-statistic sums (t11's ln discipline), making the OLS
  // inputs exact decimals; only the closed form runs in double. Scale:
  // one data-sized token reduce; everything after is vocabulary-sized. ---
  val t38ZipfFit = QueryDef.sql(
    "t38_zipf_fit",
    s"""WITH tok AS (SELECT unnest($sqlToks) AS t FROM documents),
       |tf AS (SELECT t, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY t),
       |rk AS (SELECT t, f, row_number() OVER (ORDER BY f DESC, t) AS r FROM tf),
       |pts AS (SELECT CAST(ln(r) AS DECIMAL(12,9)) AS x,
       |               CAST(ln(f) AS DECIMAL(12,9)) AS y FROM rk),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
       |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM pts)
       |SELECT n,
       |  (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |  (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS zipf_slope,
       |  (CAST(sy AS DOUBLE) -
       |    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
       |    (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
       |    CAST(sx AS DOUBLE)) / n AS intercept
       |FROM s""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    val tf = T.documents(s, d)
      .select(explode(TextFns.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("f"))
    // two-pass global rank over (f DESC, t): range-partitioned sort,
    // per-partition counts, broadcast offsets — a36's discipline
    val sorted = tf.orderBy(col("f").desc, col("t")).select(col("f"))
    val rdd = sorted.rdd
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2) // one count per partition
    val offsets = counts.scanLeft(0L)(_ + _).dropRight(1)
    val bc = s.sparkContext.broadcast(offsets)
    val ranked = rdd.mapPartitionsWithIndex { (i, it) =>
      var r = bc.value(i)
      it.map { row => r += 1; org.apache.spark.sql.Row(row.getLong(0), r) }
    }
    val rk = s.createDataFrame(ranked, new org.apache.spark.sql.types.StructType()
      .add("f", org.apache.spark.sql.types.LongType, nullable = false)
      .add("r", org.apache.spark.sql.types.LongType, nullable = false))
    val pts = rk.select(log(col("r").cast("double")).cast("decimal(12,9)").as("x"),
      log(col("f").cast("double")).cast("decimal(12,9)").as("y"))
    val st = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    def dbl(c: String) = col(c).cast("double")
    val slope = (dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")) /
      (dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"))
    st.select(col("n"), slope.as("zipf_slope"),
      ((dbl("sy") - slope * dbl("sx")) / dbl("n")).as("intercept"))
  }

  // --- t43_phrase_search: POSITIONAL inverted-index phrase retrieval —
  // t28's BM25 ranks bag-of-words matches; a phrase query ("exact words
  // in exact order") needs the index to carry positions. The posting
  // table (term → doc, position) IS the inverted index in relational
  // form — shuffled by term it is the layout a search engine stores —
  // and an n-term phrase match is the n-way positional self-join:
  // postings(w0) ⋈ postings(w1) at p+1 ⋈ postings(w2) at p+2, the
  // standard adjacency plan. Probe phrases derive deterministically
  // from the corpus (first trigram of every doc_id % 97 = 1 doc),
  // broadcast to both arms. The oracle answers the same queries by
  // DIRECT shingle scan (trigram = phrase), so the hash match proves
  // index-based retrieval ≡ full scan — the contract that matters
  // when the 100 TB corpus is indexed once and scanned never. ---
  val t43PhraseSearch = QueryDef.sql(
    "t43_phrase_search",
    s"""WITH sh AS (SELECT doc_id, i AS b, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) d,
       |  LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r),
       |probes AS (SELECT DISTINCT t[1] || ' ' || t[2] || ' ' || t[3] AS phrase
       |  FROM (SELECT $sqlToks AS t FROM documents WHERE doc_id % 97 = 1) q
       |  WHERE len(t) >= 3)
       |SELECT p.phrase, sh.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_matches,
       |  CAST(min(sh.b) AS BIGINT) AS first_pos
       |FROM sh JOIN probes p ON sh.s = p.phrase
       |GROUP BY p.phrase, sh.doc_id""".stripMargin) { (s, d) =>
    import graft.functions.TextFns
    val docs = T.documents(s, d)
    // the positional posting table: (term, doc, position) — the
    // inverted index in relational form, shuffled by term
    val post = docs.select(col("doc_id"),
      posexplode(TextFns.tokens(col("text"))).as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("w"))
    val probes = docs.filter(col("doc_id") % 97 === 1)
      .select(TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(concat_ws(" ", col("t")(0), col("t")(1), col("t")(2)).as("phrase"),
        col("t")(0).as("w0"), col("t")(1).as("w1"), col("t")(2).as("w2"))
      .distinct()
    // n-way positional adjacency join — each arm prunes by its term
    // (probes broadcast), then aligns on (doc, position ± offset)
    val m0 = post.join(broadcast(probes), col("w") === col("w0"))
      .select(col("phrase"), col("w1"), col("w2"), col("doc_id"), col("p"))
    val p1 = post.select(col("doc_id").as("d1"), col("p").as("p1"), col("w").as("x1"))
    val p2 = post.select(col("doc_id").as("d2"), col("p").as("p2"), col("w").as("x2"))
    m0.join(p1, col("doc_id") === col("d1") && col("p1") === col("p") + 1 &&
        col("x1") === col("w1"))
      .join(p2, col("doc_id") === col("d2") && col("p2") === col("p") + 2 &&
        col("x2") === col("w2"))
      .groupBy(col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("p")).cast("long").as("first_pos"))
  }

  // --- k60_text_index: TRANSACTIONAL TOKEN-BLOOM TEXT INDEX — the
  // third member of the secondary-index family (k48 bloom = WHO/point,
  // k53 zone = WHEN/range; k60 = WHAT/tokens): one bloom filter over
  // each partition's DISTINCT token vocabulary, maintained in the SAME
  // Txn as every document commit (VersionedText.commitIndexed,
  // stale-base refused via expectedVersion), so term search can never
  // read an index that lags the corpus. This is the data-skipping shape
  // for text at 100 TB: a full inverted index is corpus-sized and costs
  // a corpus-sized shuffle per refresh; the token bloom is ONE row per
  // partition (the driver folds k rows before any data file opens) and
  // a conjunctive term query opens only partitions whose bloom holds
  // EVERY term. The gate hash-partitions documents into 24 buckets,
  // commits them indexed, then a SECOND transactional commit appends a
  // doc-unique marker token (zq<doc_id>x) to every %17 doc — DF=1
  // probes whose true partition set is a singleton, so pruning is
  // measurable, and whose tokens exist ONLY in commit 2, so a stale
  // index (bloom missing the marker) is caught by the no-tv-fallback
  // candidate require, not silently widened around. Probes: three
  // single-marker lookups (each must return exactly its doc through the
  // pruned path), one marker∧first-word conjunction (same doc), and one
  // marker∧marker disjoint conjunction that must POSITIVELY report
  // zero. The oracle recomputes every probe by direct post-state token
  // scan (list_has_all), so index-based retrieval ≡ full scan rides the
  // hash. ---
  val k60TextIndex = QueryDef.sql(
    "k60_text_index",
    s"""WITH post AS (SELECT doc_id,
       |    CASE WHEN doc_id % 17 = 0
       |      THEN text || ' zq' || CAST(doc_id AS VARCHAR) || 'x'
       |      ELSE text END AS text
       |  FROM documents),
       |lows AS (SELECT list_sort(list(doc_id)) AS ids
       |  FROM (SELECT doc_id FROM documents WHERE doc_id % 17 = 0
       |        ORDER BY doc_id LIMIT 3)),
       |m AS (SELECT 'zq' || CAST(ids[1] AS VARCHAR) || 'x' AS m0,
       |             'zq' || CAST(ids[2] AS VARCHAR) || 'x' AS m1,
       |             'zq' || CAST(ids[3] AS VARCHAR) || 'x' AS m2,
       |             ids[1] AS id0 FROM lows),
       |w0 AS (SELECT t[1] AS w FROM
       |  (SELECT $sqlToks AS t FROM post
       |   WHERE doc_id = (SELECT id0 FROM m))),
       |probes AS (
       |  SELECT '1:' || m0 AS probe, [m0] AS terms FROM m
       |  UNION ALL SELECT '2:' || m1, [m1] FROM m
       |  UNION ALL SELECT '3:' || m2, [m2] FROM m
       |  UNION ALL SELECT '4:' || m0 || ' ' || (SELECT w FROM w0),
       |    [m0, (SELECT w FROM w0)] FROM m
       |  UNION ALL SELECT '5:' || m0 || ' ' || m1, [m0, m1] FROM m),
       |toks AS (SELECT doc_id, $sqlToks AS t FROM post)
       |SELECT p.probe, CAST(count(tk.doc_id) AS BIGINT) AS n_docs,
       |  min(tk.doc_id) AS min_doc, max(tk.doc_id) AS max_doc,
       |  TRUE AS pruned
       |FROM probes p LEFT JOIN toks tk ON list_has_all(tk.t, p.terms)
       |GROUP BY p.probe""".stripMargin) { (s, d) =>
    import graft.operators.{Versioned, VersionedText}
    val root = graft.Scratch.dir("k60-textidx")
    val tbl = s"$root/docs"; val idx = s"$root/tokidx"
    val docs = T.documents(s, d).select(col("doc_id"),
      pmod(col("doc_id"), lit(24)).cast("string").as("pb"), col("text"))
    VersionedText.commitIndexed(s, s"$root/txn1", tbl, idx, docs,
      "pb", Seq("doc_id"), "text")
    // churn: commit 2 appends a DOC-UNIQUE marker token to %17 docs —
    // its tokens exist only in this commit, so the probes below prove
    // the index delta rode the same transaction as the data
    val delta = docs.filter(col("doc_id") % 17 === 0)
      .withColumn("text", concat(col("text"),
        lit(" zq"), col("doc_id").cast("string"), lit("x")))
    VersionedText.commitIndexed(s, s"$root/txn2", tbl, idx, delta,
      "pb", Seq("doc_id"), "text")
    val low3: Seq[Long] = delta.select(col("doc_id")).orderBy(col("doc_id"))
      .limit(3).collect().map(_.getLong(0)).toSeq
    require(low3.size == 3, s"need 3 churned probe docs, got ${low3.size}")
    val marks = low3.map(id => s"zq${id}x")
    val w0 = delta.filter(col("doc_id") === low3.head)
      .select(VersionedText.tokens(col("text"))(0)).head.getString(0)
    // pruning evidence WITHOUT the tv fallback: the bloom itself must
    // hold each marker's partition (a stale index fails loudly here)
    // and must prune — a DF=1 token's candidates are 1 + false
    // positives, never the table
    val nParts = Versioned.readAsOf(s, idx).count()
    low3.zip(marks).foreach { case (id, mk) =>
      val cands = VersionedText.candidatePartitions(s, idx, Seq(mk))
      require(cands.contains((id % 24).toString),
        s"bloom must hold $mk's own partition — stale index?")
      require(cands.size <= nParts / 2,
        s"token pruning must be real: |$mk| -> ${cands.size} of $nParts")
    }
    val probes: Seq[(String, Seq[String])] = Seq(
      (s"1:${marks(0)}", Seq(marks(0))),
      (s"2:${marks(1)}", Seq(marks(1))),
      (s"3:${marks(2)}", Seq(marks(2))),
      (s"4:${marks(0)} $w0", Seq(marks(0), w0)),
      (s"5:${marks(0)} ${marks(1)}", Seq(marks(0), marks(1))))
    probes.map { case (label, terms) =>
      VersionedText.lookupAll(s, tbl, idx, "text", terms)
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .select(lit(label).as("probe"), col("n_docs"),
          col("min_doc"), col("max_doc"), lit(true).as("pruned"))
    }.reduce(_ unionByName _)
  }

  val all: Seq[QueryDef] = Seq(
    t43PhraseSearch, k60TextIndex,
    t38ZipfFit, t39BpeEncode, t40Dsir, t41NgramNovelty, t42ChatTemplate,
    t37RakeKeyphrases,
    t33CorpusPipeline, t34LengthBatching, t35BpeMerges, t36SpanDecontaminate,
    t8PackSequences, t9NgramCounts, t10RedactPii, d5Contamination,
    t11UnigramLogprob, t12Repetition, t14NormalizeText, t15LeakSafeSplit,
    t16TemperatureMix, t17FeatureHashing, t18DocKnn, d8VerbatimLeak,
    t19Tfidf, t20WeightedSample, d9BloomScreen, t21ChunkOverlap,
    d10ContainmentPairs, t22JsonlIngest, t23SentenceStats, t24BigramPmi,
    t25DataCards, t26MixEntropy, t27LinearScore, t28Bm25, t29Boilerplate,
    t30TargetEncode, t32BigramLogprob)
}
