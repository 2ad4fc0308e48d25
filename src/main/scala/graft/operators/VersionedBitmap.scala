package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BITMAP secondary index maintained TRANSACTIONALLY with its table —
  * the low-cardinality sibling of [[VersionedBloom]] (point keys) and
  * [[VersionedZone]] (ranges): per partition, ONE 64-bit bitmap over a
  * double-hashed categorical domain, answering "which partitions MAY hold
  * category value v" from k index longs before any listing or data I/O.
  *
  * Shape: index rows `(pval, bm, n_vals, tv)` where `bm` sets TWO
  * hashed bit positions for every distinct value v present in the
  * partition (see [[BitExpr]]). For the domains bitmap indexes are FOR
  * (status flags, priorities, languages — ≤ a few dozen values),
  * collisions are rare and harmless in the safe direction: a probe
  * requires both its bits, set bits admit the partition (possible
  * false positive, exactness comes from the residual filter), a
  * missing bit PROVES absence — identical conservativeness to the
  * other index families. Equality probes
  * compose with k54's intersection: point ∧ range ∧ bitmap candidate
  * sets intersect before any data file opens.
  *
  * Same transactional contract as the siblings: every table commit and
  * its bitmap delta land in ONE [[Txn]] with the base version pinned
  * as `expectedVersion`, so no reader can observe a table version
  * whose bitmap predates it; [[lookupEq]] reconciles per-partition
  * freshness tags against the manifest so even a mid-transaction
  * reader gets exact results. At 100 TB the win is the classic one: a
  * rare category ("holiday", "fraud-flagged", a rare language)
  * physically localized in few partitions resolves to those partitions
  * from one k-row index fold. */
object VersionedBitmap {

  /** The bits a category value occupies — TWO independent positions
    * (`xxhash64(v)` and `xxhash64(v, salt)`, each mod 64), OR-ed into
    * one long; a candidate partition must hold BOTH. One bit per value
    * admits a false candidate whenever any co-resident category lands
    * on the probe's bit (~5% per partition at typical 3–4 categories);
    * two bits square that away (<1%) while `bm` stays a single long.
    * Stated once as SQL over a column named `v` and used verbatim on
    * BOTH the build and probe side, so the probe hash can never drift
    * from the build hash. */
  private val BitExpr =
    "shiftleft(1L, CAST(pmod(xxhash64(CAST(v AS STRING)), 64) AS INT)) | " +
      "shiftleft(1L, CAST(pmod(xxhash64(CAST(v AS STRING), 'graft-bm-2'), 64) AS INT))"

  /** Probe-side bit for an arbitrary value expression: one 1-row
    * LOCAL-relation evaluation of [[BitExpr]] — the optimizer folds a
    * project over a LocalRelation, so the collect launches no job. */
  private def probeBit(spark: SparkSession, value: Column): Long = {
    import spark.implicits._
    Seq(0).toDF("z").select(value.cast("string").as("v"))
      .select(expr(BitExpr).as("b")).collect()(0).getLong(0)
  }

  /** The bitmap rows for `delta`'s affected partitions as they will
    * stand AFTER the commit: (pval, bm, n_vals, tv) over merge(affected
    * partitions AS OF `asOfVersion`, delta). Same base-pinning contract
    * as [[VersionedZone.indexDelta]]: callers that commit the result
    * MUST pin `asOfVersion` and pass the same version as the table
    * write's `expectedVersion` — a stale-base bitmap could miss an
    * interleaved commit's categories, the false negative this index
    * exists to make impossible. NULL category values set no bit (a
    * NULL never satisfies an equality probe — conservative). */
  def indexDelta(
      spark: SparkSession,
      tablePath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      valCol: String,
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
    // distinct (partition, value) BEFORE hashing: the partial-agg
    // combine collapses the category multiset map-side, so the shuffle
    // carries each partition's domain once, not its row count
    merged
      .select(col(partCol).cast("string").as("pval"), col(valCol).as("v"))
      .filter(col("v").isNotNull)
      .distinct()
      .select(col("pval"), expr(BitExpr).as("bit"))
      .groupBy(col("pval"))
      .agg(expr("bit_or(bit)").as("bm"), count(lit(1)).as("n_vals"))
      .withColumn("tv", lit(base + 1)) // freshness tag, as in the siblings
  }

  /** Commit `delta` and its bitmap maintenance as one atomic
    * transaction ([[VersionedZone.commitIndexed]]'s contract). */
  def commitIndexed(
      spark: SparkSession,
      txnDir: String,
      tablePath: String,
      indexPath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      valCol: String,
      stamp: Option[Long] = None): Map[String, Long] = {
    val base = Versioned.latestVersion(spark, tablePath)
    Txn.run(spark, txnDir, Seq(
      Txn.Write(tablePath, delta, partCol, keys, stamp,
        expectedVersion = Some(base)),
      Txn.Write(indexPath,
        indexDelta(spark, tablePath, delta, partCol, keys, valCol,
          asOfVersion = base),
        "pval", Seq("pval"), stamp)))
  }

  /** The partitions that MAY hold category `value`: bitmap rows with
    * the value's bit set. K index rows scanned, no data I/O.
    * Index-only view, NO freshness reconciliation — use [[lookupEq]]
    * for reads that must stay exact under concurrent commits. */
  def candidatePartitions(
      spark: SparkSession, indexPath: String, value: Column): Seq[String] = {
    val bit = probeBit(spark, value)
    Versioned.readAsOf(spark, indexPath)
      .filter(col("bm").bitwiseAND(lit(bit)) === lit(bit))
      .select(col("pval")).distinct()
      .collect().map(_.getString(0)).toSeq
  }

  /** Bitmap-pruned equality read: resolve the table's CURRENT
    * manifest, open ONLY partitions whose bitmap admits `value` — plus
    * any partition whose index row is stale or missing (tv ≠ manifest
    * generation), closing the concurrent-commit window exactly as
    * [[VersionedZone.lookupRange]] does — then apply the exact
    * equality filter. Equals full-scan-and-filter by construction. */
  def lookupEq(
      spark: SparkSession,
      tablePath: String,
      indexPath: String,
      valCol: String,
      value: Column): DataFrame = {
    val refs = Versioned
      .manifestRefs(spark, tablePath, Versioned.latestVersion(spark, tablePath))
    val idx = Versioned.readAsOf(spark, indexPath)
      .select(col("pval"), col("bm"), col("tv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bit = probeBit(spark, value)
    val cand = refs.filter { case (pval, gen) =>
      idx.get(pval) match {
        case Some((bm, tv)) => (bm & bit) == bit || tv != gen // stale row: open
        case None => true // unindexed partition: conservative
      }
    }
    val base =
      if (cand.isEmpty)
        Versioned.readAsOf(spark, tablePath).limit(0).drop("__p")
      else Versioned.readRefs(spark, tablePath, cand).drop("__p")
    base.filter(col(valCol) === value)
  }

  /** The FULL index-family composition — point ∧ range ∧ category in
    * one pruned read ([[VersionedBloom.lookupKeysInRange]]'s point∧range
    * extended by the bitmap): resolve the table's CURRENT manifest and
    * open ONLY partitions that pass ALL THREE probes — bloom
    * may-hold-key, zone range-overlap, bitmap may-hold-category — with
    * each per-partition verdict independently falling back to "open it"
    * when that index's row is stale (tv ≠ manifest generation) or
    * missing, so a mid-transaction reader stays exact per index. The
    * exact residual filter then runs on the admitted files alone;
    * equals full-scan-and-filter by construction. k64's gate proves
    * the triple intersection prunes strictly below every two-index
    * composition on data where each index rules out different
    * partitions. */
  def lookupEqKeysInRange(
      spark: SparkSession,
      tablePath: String,
      bloomIdxPath: String,
      zoneIdxPath: String,
      bitmapIdxPath: String,
      keyCol: String,
      keys: Seq[Long],
      valCol: String,
      lo: Column,
      hi: Column,
      catCol: String,
      catValue: Column,
      bits: Int = 1 << 16): DataFrame = {
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
    val mRows = Versioned.readAsOf(spark, bitmapIdxPath)
      .select(col("pval"), col("bm"), col("tv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bit = probeBit(spark, catValue)
    val cand = refs.filter { case (p, g) =>
      (bMatch(p) || !bTv.get(p).contains(g)) &&
        (zMatch(p) || !zTv.get(p).contains(g)) &&
        (mRows.get(p) match {
          case Some((bm, tv)) => (bm & bit) == bit || tv != g
          case None => true
        })
    }
    val base =
      if (cand.isEmpty)
        Versioned.readAsOf(spark, tablePath).limit(0).drop("__p")
      else Versioned.readRefs(spark, tablePath, cand).drop("__p")
    base.filter(col(keyCol).isin(keys: _*) && col(valCol) >= lo &&
      col(valCol) <= hi && col(catCol) === catValue)
  }
}
