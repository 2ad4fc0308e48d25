package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEXT secondary index maintained TRANSACTIONALLY with its table —
  * the third member of the index family ([[VersionedBloom]] answers
  * point keys, [[VersionedZone]] answers ranges; this answers "which
  * partitions contain documents with these TOKENS"): a partition-level
  * bloom filter over each partition's DISTINCT token set, itself stored
  * as a (tiny) Versioned table, with every table commit and its index
  * delta landing in ONE [[Txn]] — no reader can observe a table version
  * whose token index predates it.
  *
  * This is the data-skipping shape a 100 TB document corpus needs for
  * term search: a full inverted index (term → doc posting lists) is
  * corpus-sized and costs a corpus-sized shuffle to maintain; a
  * per-partition token bloom is k rows TOTAL (one per partition, a few
  * hundred KB each), folds on the driver before any data file opens,
  * and a conjunctive term query touches only partitions whose bloom
  * holds EVERY term. Pruning is conservative by bloom construction
  * (false positive = an extra partition open; false negative impossible
  * because every distinct token of the partition's post-image sets its
  * positions), and the exact token filter runs on the opened
  * partitions — a pruned search returns exactly what a full
  * scan-and-filter would, which is what the k60 gate hash-proves.
  *
  * Tokens hash as STRINGS (xxhash64 on the raw token) — unlike
  * [[BloomIndex.positions]], which casts through long for integral key
  * columns; a string cast there would NULL out and collapse every token
  * to one position (conservative but useless). Build side and probe
  * side share [[positions]], so they can never disagree.
  */
object VersionedText {

  // wider than the point-key default (1<<16): a partition's distinct
  // TOKEN set is orders of magnitude larger than its key set, and the
  // fill factor is what sets the false-positive rate
  private val DefaultBits = 1 << 18

  /** k=2 hash positions of a token in an m-bit space — string-typed on
    * both the build and probe side (see class doc). */
  private[operators] def positions(tok: Column, bits: Int): Seq[Column] = Seq(
    pmod(xxhash64(tok), lit(bits.toLong)),
    pmod(xxhash64(tok, lit("graft-text-2")), lit(bits.toLong)))

  /** Whitespace tokenizer shared with the t-family text operators
    * (TextFns.tokens): collapse runs of whitespace, split on single
    * spaces. The DuckDB mirror is
    * `string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')`. */
  def tokens(text: Column): Column = graft.functions.TextFns.tokens(text)

  /** The index rows for `delta`'s affected partitions as they will
    * stand AFTER the commit: token-bloom positions over merge(affected
    * partitions AS OF `asOfVersion`, delta) — (pval, n_terms, bloom,
    * tv), keyed and partitioned by pval. Same base-pinning
    * contract as [[VersionedBloom.indexDelta]]: callers that commit the
    * result MUST pin `asOfVersion` and pass the same version as the
    * table write's `expectedVersion` (see [[commitIndexed]]) — a
    * stale-base bloom could miss an interleaved commit's tokens in
    * shared partitions, the false negative this index exists to make
    * impossible. */
  def indexDelta(
      spark: SparkSession,
      tablePath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      textCol: String,
      bits: Int = DefaultBits,
      asOfVersion: Long = -1L): DataFrame = {
    val base =
      if (asOfVersion < 0) Versioned.latestVersion(spark, tablePath) else asOfVersion
    val affected = delta.select(col(partCol)).distinct().collect()
      .map(_.get(0)).toSeq // partition domain — driver-sized by design
    val merged =
      if (base == 0) delta
      else Upsert.merge(
        Versioned.readAsOf(spark, tablePath, base)
          .filter(col(partCol).isin(affected: _*)),
        delta, keys)
    // distinct (partition, token) BEFORE hashing: the partial-agg
    // combine collapses the token multiset map-side, so the shuffle
    // carries each partition's vocabulary once, not the corpus
    merged
      .select(col(partCol).cast("string").as("pval"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .distinct()
      .select(col("pval"), col("w"),
        explode(array(positions(col("w"), bits): _*)).as("p"))
      .groupBy(col("pval"))
      .agg(countDistinct(col("w")).as("n_terms"),
        sort_array(collect_set(col("p"))).as("bloom"))
      // tv = the table version this row describes — [[lookupAll]]'s
      // freshness tag (see VersionedBloom.indexDelta for the argument)
      .withColumn("tv", lit(base + 1))
  }

  /** Commit `delta` and its token-index maintenance as one atomic
    * transaction; the base snapshot rides as the table write's
    * `expectedVersion`, so an interleaving commit aborts with
    * [[Txn.TxnConflictException]] instead of shipping a bloom that is
    * missing its tokens. Returns the (table → version) map. */
  def commitIndexed(
      spark: SparkSession,
      txnDir: String,
      tablePath: String,
      indexPath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      textCol: String,
      bits: Int = DefaultBits,
      stamp: Option[Long] = None): Map[String, Long] = {
    val base = Versioned.latestVersion(spark, tablePath)
    Txn.run(spark, txnDir, Seq(
      Txn.Write(tablePath, delta, partCol, keys, stamp,
        expectedVersion = Some(base)),
      Txn.Write(indexPath,
        indexDelta(spark, tablePath, delta, partCol, keys, textCol, bits,
          asOfVersion = base),
        "pval", Seq("pval"), stamp)))
  }

  /** Probe positions for `terms`, computed THROUGH Spark so the probe
    * hash can never drift from the build hash (same [[positions]]
    * expression, same engine). Driver-sized: 2 longs per term. */
  private def probePositions(
      spark: SparkSession, terms: Seq[String], bits: Int): Seq[Long] = {
    import spark.implicits._
    require(terms.nonEmpty, "need at least one probe term")
    terms.toDF("w")
      .select(explode(array(positions(col("w"), bits): _*)).as("p"))
      .distinct().collect().map(_.getLong(0)).toSeq
  }

  /** The partitions that MAY contain a document holding EVERY term in
    * `terms` (conjunctive): blooms holding all positions of all terms.
    * K index rows scanned, no data I/O. Index-only view, NO freshness
    * reconciliation — use [[lookupAll]] for reads that must stay exact
    * under concurrent commits. */
  def candidatePartitions(
      spark: SparkSession,
      indexPath: String,
      terms: Seq[String],
      bits: Int = DefaultBits): Seq[String] = {
    val ps = probePositions(spark, terms, bits)
    Versioned.readAsOf(spark, indexPath)
      .filter(ps.map(p => array_contains(col("bloom"), p)).reduce(_ && _))
      .select(col("pval")).distinct()
      .collect().map(_.getString(0)).toSeq
  }

  /** Index-pruned conjunctive term search: open ONLY partitions whose
    * bloom holds every term, plus any partition whose index row is
    * stale or missing (tv ≠ manifest generation — the freshness
    * reconciliation that keeps reads exact between a concurrent
    * transaction's two applies; staleness can only widen the read,
    * never wrongly prune), then apply the exact token filter: every
    * term must appear as a WHOLE TOKEN of the text under the same
    * tokenizer the index was built with. Equals full-scan-and-filter
    * by construction. */
  def lookupAll(
      spark: SparkSession,
      tablePath: String,
      indexPath: String,
      textCol: String,
      terms: Seq[String],
      bits: Int = DefaultBits): DataFrame = {
    val refs = Versioned
      .manifestRefs(spark, tablePath, Versioned.latestVersion(spark, tablePath))
    val ps = probePositions(spark, terms, bits)
    // one k-row collect: match verdict + freshness tag together (two
    // collects paid the index scan's fixed job cost twice)
    val idxRows = Versioned.readAsOf(spark, indexPath)
      .select(col("pval"), col("tv"),
        ps.map(p => array_contains(col("bloom"), p)).reduce(_ && _).as("m"))
      .collect()
    val matched: Set[String] =
      idxRows.filter(_.getBoolean(2)).map(_.getString(0)).toSet
    val tv: Map[String, Long] =
      idxRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val cand = refs.filter { case (pval, gen) =>
      matched(pval) || !tv.get(pval).contains(gen)
    }
    val base =
      if (cand.isEmpty)
        Versioned.readAsOf(spark, tablePath).limit(0).drop("__p")
      else Versioned.readRefs(spark, tablePath, cand).drop("__p")
    base.filter(terms.map(t => array_contains(tokens(col(textCol)), t))
      .reduce(_ && _))
  }
}
