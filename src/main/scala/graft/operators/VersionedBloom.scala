package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary index maintained TRANSACTIONALLY with its table — the
  * "indexes can never go stale" composition: a partition-level bloom
  * index over a [[Versioned]] table, itself stored as a (tiny)
  * Versioned table, with every table commit and its index delta landing
  * in ONE [[Txn]] — no reader can ever observe a table version whose
  * index predates it (the drift every external secondary index suffers
  * between a write and the index refresh job).
  *
  * Partition granularity is what makes the delta O(delta): a Versioned
  * commit rewrites exactly its affected partitions, so the index delta
  * is the recomputed bloom row of those partitions' POST-state —
  * keyed upsert by pval replaces the stale rows, untouched partitions
  * keep their index rows. [[BloomIndex]]'s k=2 sparse-positions
  * representation, conservative by construction: lookups open every
  * candidate partition (false positive = extra partition read, false
  * negative impossible), then the exact key filter runs — a pruned
  * lookup returns exactly what a full scan would, which is what the
  * k48 gate hash-proves.
  */
object VersionedBloom {

  private val DefaultBits = 1 << 16

  /** The index rows for `delta`'s affected partitions as they will
    * stand AFTER the commit: bloom positions over merge(affected
    * partitions AS OF `asOfVersion`, delta). Compute this BEFORE the
    * commit and hand both frames to one [[Txn]] — (pval, entries,
    * bloom), keyed and partitioned by pval. `asOfVersion` pins the
    * base snapshot the merge reads (-1 = current latest); callers that
    * commit the result MUST pin it and pass the same version as the
    * table write's `expectedVersion` (see [[commitIndexed]]), or a
    * commit landing between this computation and the transaction's
    * prepare would leave the index missing that commit's keys in
    * shared partitions — a bloom FALSE NEGATIVE, the one failure mode
    * this index is designed to make impossible. */
  def indexDelta(
      spark: SparkSession,
      tablePath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      keyCol: String,
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
    merged
      .select(col(partCol).cast("string").as("pval"),
        explode(array(BloomIndex.positions(col(keyCol), bits): _*)).as("p"))
      .groupBy(col("pval"))
      .agg(count(lit(1)).as("entries"),
        sort_array(collect_set(col("p"))).as("bloom"))
      // tv = the TABLE version this row describes (base + 1, the slot
      // the paired table write intends): [[lookup]] compares it with
      // the manifest's per-partition generation and treats any
      // mismatch as an unconditional candidate — the freshness
      // reconciliation that makes reads exact under EVERY interleaving
      // of a concurrent commitIndexed's two applies (a burned-slot
      // conflict leaves tv < gen, which only errs conservative)
      .withColumn("tv", lit(base + 1))
  }

  /** Commit `delta` and its index maintenance as one atomic
    * transaction. Returns the committed (table → version) map —
    * table and index versions move in lockstep.
    *
    * The base version the index delta is computed from is pinned and
    * passed as the table write's `expectedVersion`: a concurrent commit
    * landing between the index computation and the transaction's
    * prepare aborts the whole transaction with
    * [[Txn.TxnConflictException]] (the caller re-derives and retries)
    * instead of silently committing index rows that are missing the
    * interleaved commit's keys — stale-base index deltas are the one
    * path to a bloom false negative, so they are refused, not raced. */
  def commitIndexed(
      spark: SparkSession,
      txnDir: String,
      tablePath: String,
      indexPath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      keyCol: String,
      bits: Int = DefaultBits,
      stamp: Option[Long] = None): Map[String, Long] = {
    val base = Versioned.latestVersion(spark, tablePath)
    Txn.run(spark, txnDir, Seq(
      Txn.Write(tablePath, delta, partCol, keys, stamp,
        expectedVersion = Some(base)),
      Txn.Write(indexPath,
        indexDelta(spark, tablePath, delta, partCol, keys, keyCol, bits,
          asOfVersion = base),
        "pval", Seq("pval"), stamp)))
  }

  /** [[commitIndexed]] with the optimistic-conflict RETRY LOOP callers
    * otherwise hand-roll: on [[Txn.TxnConflictException]] the base
    * snapshot is re-read and the index delta re-derived against it
    * (the delta argument is a lazy plan, so re-invocation re-evaluates
    * everything at the new head), under a FRESH coordinator directory
    * per attempt (coordinator dirs are single-use — the conflicted
    * attempt's `_ABORTED` marker stays behind as its own record).
    * Bounded attempts: livelock under heavy contention surfaces as a
    * loud failure carrying the last conflict, not an infinite loop. */
  def commitIndexedRetry(
      spark: SparkSession,
      txnDir: String,
      tablePath: String,
      indexPath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      keyCol: String,
      bits: Int = DefaultBits,
      stamp: Option[Long] = None,
      maxRetries: Int = 5): Map[String, Long] = {
    var attempt = 0
    var last: Txn.TxnConflictException = null
    while (attempt <= maxRetries) {
      try return commitIndexed(spark, s"$txnDir-a$attempt", tablePath,
        indexPath, delta, partCol, keys, keyCol, bits, stamp)
      catch { case e: Txn.TxnConflictException => last = e; attempt += 1 }
    }
    throw new IllegalStateException(
      s"commitIndexed still conflicting after $maxRetries retries on " +
        s"$tablePath — contention too high for optimistic concurrency; " +
        s"last conflict: ${last.getMessage}")
  }

  /** COMPOSED point∧range lookup — the "customer X's orders in Q1"
    * shape: candidates are the INTERSECTION of the bloom index's
    * point-key candidates and the zone index's range candidates, both
    * over the SAME table (each maintained transactionally with it —
    * one [[Txn]] can carry the table write plus BOTH index deltas; the
    * k54 gate does). Conservative composition: each side's candidate
    * set is a superset of its true set (match ∪ stale-tv ∪ absent —
    * [[lookup]]'s freshness argument), and an intersection of
    * supersets is a superset of the true intersection, so the read
    * stays exact while each index prunes the dimension the other
    * cannot. K index rows per side, no data I/O before the candidate
    * refs open. */
  def lookupKeysInRange(
      spark: SparkSession,
      tablePath: String,
      bloomIdxPath: String,
      zoneIdxPath: String,
      keyCol: String,
      keys: Seq[Long],
      valCol: String,
      lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column,
      bits: Int = DefaultBits): DataFrame = {
    import spark.implicits._
    val refs = Versioned
      .manifestRefs(spark, tablePath, Versioned.latestVersion(spark, tablePath))
    // one k-row collect per index: match verdict + freshness tag
    // together (lookup's round-12 discipline)
    val bRows = Versioned.readAsOf(spark, bloomIdxPath)
      .crossJoin(broadcast(keys.toDF("k")
        .select(array(BloomIndex.positions(col("k"), bits): _*).as("ps"))))
      .select(col("pval"), col("tv"),
        expr("forall(ps, p -> array_contains(bloom, p))").as("m"))
      .collect()
    val bMatch: Set[String] = bRows.filter(_.getBoolean(2)).map(_.getString(0)).toSet
    val bTv: Map[String, Long] = bRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val zRows = Versioned.readAsOf(spark, zoneIdxPath)
      .select(col("pval"), col("tv"),
        (!(col("max_v") < lo || col("min_v") > hi)).as("m"))
      .collect()
    // NULL verdict (all-NULL partition) = unmatched — conservative
    val zMatch: Set[String] =
      zRows.filter(r => !r.isNullAt(2) && r.getBoolean(2)).map(_.getString(0)).toSet
    val zTv: Map[String, Long] = zRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val cand = refs.filter { case (p, g) =>
      (bMatch(p) || !bTv.get(p).contains(g)) &&
        (zMatch(p) || !zTv.get(p).contains(g))
    }
    val base =
      if (cand.isEmpty)
        Versioned.readAsOf(spark, tablePath).limit(0).drop("__p")
      else Versioned.readRefs(spark, tablePath, cand).drop("__p")
    base.filter(col(keyCol).isin(keys: _*) && col(valCol) >= lo && col(valCol) <= hi)
  }

  /** Atomic ERASURE with index maintenance — the GDPR composition:
    * remove the `keys` rows from the table AND land the affected
    * partitions' POST-DELETE bloom rows in ONE transaction (a
    * [[Txn]] delete write + an index upsert under one `_COMMIT`).
    * Surviving affected partitions get tight recomputed registers;
    * partitions the delete EMPTIES get an (entries=0, bloom=[]) row —
    * never a candidate again. Leaving the index untouched would be
    * merely conservative (bloom false positives cost extra partition
    * opens, never wrong answers), but an erasure pipeline must also
    * stop PROBING a forgotten subject's key against storage, so the
    * index forgets in the same decision point as the data. The base
    * snapshot is pinned as `expectedVersion` (commitIndexed's stale-
    * base refusal). HEAD erasure only: older versions still read the
    * rows until [[Versioned.expire]] / Forget.scrubVersioned reclaims
    * them — pair with a scrub for history-destroying deletes.
    *
    * Cost note: the affected-partition probe runs here (for the index
    * rows) AND again inside the delete's apply — recomputing from the
    * staged key frame is the deliberate trade: a staged affected-set
    * hint is only valid while the base cannot move under the prepared
    * transaction, and recovery re-drives apply in exactly the crash
    * states where trusting stale prepare-time metadata is how erasures
    * get lost. Two delta-probe scans buy an erasure that is correct
    * from any crash point. */
  def deleteIndexed(
      spark: SparkSession,
      txnDir: String,
      tablePath: String,
      indexPath: String,
      keys: DataFrame,
      keyCols: Seq[String],
      keyCol: String,
      bits: Int = DefaultBits,
      stamp: Option[Long] = None): Map[String, Long] = {
    val base = Versioned.latestVersion(spark, tablePath)
    require(base > 0, s"no committed version at $tablePath")
    // readRefs keeps the __p partition tag readAsOf strips — the
    // affected-set probe and post-delete recompute key off it
    val state = Versioned.readRefs(spark, tablePath,
      Versioned.manifestRefs(spark, tablePath, base))
    val rm = keys.select(keyCols.map(col).toIndexedSeq: _*).distinct()
    // partition domain — driver-sized by design (commit's discipline)
    val affected: Seq[String] = state.join(rm, keyCols, "left_semi")
      .select(col("__p")).distinct().collect().map(_.getString(0)).toSeq
    val affectedPred =
      if (affected.isEmpty) lit(false) else col("__p").isin(affected: _*)
    import spark.implicits._
    // ONE aggregate covers surviving AND fully-emptied partitions: a
    // null-pos seed row per affected partition keeps emptied pvals in
    // the group domain (count/collect_set ignore nulls, so a seed
    // contributes entries=0 and an empty bloom). The former shape
    // derived the survivor aggregate TWICE — once directly, once under
    // an anti-join computing the emptied set — re-reading every
    // affected partition's data per derivation.
    val zeroSeed = affected.toDF("pval")
      .select(col("pval"), lit(null).cast("long").as("pos"))
    val idxRows = state.filter(affectedPred)
      .join(rm, keyCols, "left_anti")
      .select(col("__p").as("pval"),
        explode(array(BloomIndex.positions(col(keyCol), bits): _*)).as("pos"))
      .unionByName(zeroSeed)
      .groupBy(col("pval"))
      .agg(count(col("pos")).as("entries"),
        sort_array(collect_set(col("pos"))).as("bloom"))
      .withColumn("tv", lit(base + 1)) // lookup's freshness tag
    Txn.run(spark, txnDir, Seq(
      Txn.Write(tablePath, rm, partCol = "", keys = keyCols, stamp,
        expectedVersion = Some(base), op = "delete"),
      Txn.Write(indexPath, idxRows, "pval", Seq("pval"), stamp)))
  }

  /** The partitions that MAY hold at least one of `keys` (all k hash
    * positions present in the partition's bloom row). Index-only view,
    * NO freshness reconciliation against the table manifest — use
    * [[lookup]] for reads that must stay exact under concurrent
    * commits; this is the raw pruning signal (specs, diagnostics,
    * quiescent tables). */
  def candidatePartitions(
      spark: SparkSession,
      indexPath: String,
      keys: Seq[Long],
      bits: Int = DefaultBits): Seq[String] = {
    import spark.implicits._
    val probes = keys.toDF("k")
      .select(array(BloomIndex.positions(col("k"), bits): _*).as("ps"))
    Versioned.readAsOf(spark, indexPath)
      .crossJoin(broadcast(probes))
      .filter(expr("forall(ps, p -> array_contains(bloom, p))"))
      .select(col("pval")).distinct()
      .collect().map(_.getString(0)).toSeq
  }

  /** Index-pruned point lookup: resolve the table's CURRENT manifest,
    * open ONLY the candidate partitions' directories (true partition
    * pruning — non-candidates are never listed, let alone read), then
    * apply the exact key filter. Equals full-scan-and-filter by
    * construction — INCLUDING under a concurrent commitIndexed: the
    * transaction applies its two writes sequentially, so a reader can
    * land between them and pair a newer table with an older index row
    * (or vice versa). Each index row carries `tv`, the table version
    * it describes; any partition whose manifest generation differs
    * from its index row's tv (or that has no index row) is a candidate
    * UNCONDITIONALLY — staleness can only widen the read, never drop a
    * row. */
  def lookup(
      spark: SparkSession,
      tablePath: String,
      indexPath: String,
      keyCol: String,
      keys: Seq[Long],
      bits: Int = DefaultBits): DataFrame = {
    import spark.implicits._
    val refs = Versioned
      .manifestRefs(spark, tablePath, Versioned.latestVersion(spark, tablePath))
    // ONE k-row collect carries both the match verdicts and the
    // freshness tags (two separate collects paid the index scan's
    // fixed job cost twice for the same k rows)
    val idxRows = Versioned.readAsOf(spark, indexPath)
      .crossJoin(broadcast(keys.toDF("k")
        .select(array(BloomIndex.positions(col("k"), bits): _*).as("ps"))))
      .select(col("pval"), col("tv"),
        expr("forall(ps, p -> array_contains(bloom, p))").as("m"))
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
    base.filter(col(keyCol).isin(keys: _*))
  }
}
