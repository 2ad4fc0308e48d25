package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RANGE secondary index maintained TRANSACTIONALLY with its table —
  * [[VersionedBloom]]'s sibling for range predicates: a
  * partition-level zone (min/max) index over a [[Versioned]] table,
  * itself stored as a (tiny) Versioned table, with every table commit
  * and its index delta landing in ONE [[Txn]] — no reader can observe
  * a table version whose zone index predates it.
  *
  * [[ZoneMap]] (k29) skips FILES of a static parquet table and must be
  * rebuilt after every write; this skips PARTITIONS of a versioned
  * table and can never go stale — the commit that moves a value moves
  * its index row at the same decision point. The 100 TB case is the
  * time-partitioned fact table: a quarter's range query resolves its
  * candidate partitions from k index rows BEFORE any listing, then
  * opens only their manifest refs. Pruning is CONSERVATIVE by
  * construction: a partition is skipped only when its [min, max]
  * provably misses the range (min/max ignore NULLs, and NULL values
  * never satisfy a range predicate, so all-NULL partitions prune
  * safely); a pruned read returns exactly what a full scan would —
  * the k53 gate hash-proves it. */
object VersionedZone {

  /** The zone rows for `delta`'s affected partitions as they will
    * stand AFTER the commit: (pval, rows, min_v, max_v, n_nulls) over
    * merge(affected partitions AS OF `asOfVersion`, delta). Callers
    * that commit the result MUST pin `asOfVersion` and pass the same
    * version as the table write's `expectedVersion` (see
    * [[commitIndexed]]) — a stale-base zone row could understate
    * min/max and prune a partition that now holds matching rows. */
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
    merged
      .groupBy(col(partCol).cast("string").as("pval"))
      .agg(count(lit(1)).as("rows"),
        min(col(valCol)).as("min_v"), max(col(valCol)).as("max_v"),
        count(when(col(valCol).isNull, 1)).as("n_nulls"))
      // tv = the table version this row describes — [[lookupRange]]'s
      // freshness tag (see VersionedBloom.indexDelta for the argument)
      .withColumn("tv", lit(base + 1))
  }

  /** Commit `delta` and its zone-index maintenance as one atomic
    * transaction; the base snapshot the index delta is computed from
    * rides as the table write's `expectedVersion`, so an interleaving
    * commit aborts with [[Txn.TxnConflictException]] instead of
    * shipping an understated zone row (the one path to a wrongly
    * pruned partition). Returns the (table → version) map. */
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

  /** MULTI-COLUMN zone rows — one (min_<c>, max_<c>, nulls_<c>) triple
    * per indexed column, one row per partition: the time-partitioned
    * fact table at 100 TB prunes on (ship_date, receipt_date, quantity)
    * SIMULTANEOUSLY, and a conjunction of per-column interval tests
    * over one k-row index beats intersecting k separate indexes (one
    * scan, no per-index tv reconciliation drift). Same base-pinning
    * contract as [[indexDelta]]; each column keeps its own type (dates
    * compare as dates, decimals as decimals — no stringly min/max). */
  def indexDeltaMulti(
      spark: SparkSession,
      tablePath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      valCols: Seq[String],
      asOfVersion: Long = -1L): DataFrame = {
    require(valCols.nonEmpty, "need at least one indexed column")
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
    val aggs = count(lit(1)).as("rows") +: valCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        count(when(col(c).isNull, 1)).as(s"nulls_$c"))
    }
    merged
      .groupBy(col(partCol).cast("string").as("pval"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("tv", lit(base + 1)) // freshness tag, as in indexDelta
  }

  /** Commit `delta` and its MULTI-COLUMN zone maintenance as one atomic
    * transaction ([[commitIndexed]]'s contract, column list instead of
    * one column). */
  def commitIndexedMulti(
      spark: SparkSession,
      txnDir: String,
      tablePath: String,
      indexPath: String,
      delta: DataFrame,
      partCol: String,
      keys: Seq[String],
      valCols: Seq[String],
      stamp: Option[Long] = None): Map[String, Long] = {
    val base = Versioned.latestVersion(spark, tablePath)
    Txn.run(spark, txnDir, Seq(
      Txn.Write(tablePath, delta, partCol, keys, stamp,
        expectedVersion = Some(base)),
      Txn.Write(indexPath,
        indexDeltaMulti(spark, tablePath, delta, partCol, keys, valCols,
          asOfVersion = base),
        "pval", Seq("pval"), stamp)))
  }

  /** One column's interval test over a multi-column zone row: NOT
    * provably disjoint from [lo, hi]. NULL min/max (all-NULL partition)
    * yields NULL and drops — conservative, as in
    * [[candidatePartitions]]. */
  private def intersects(c: String, lo: Column, hi: Column): Column =
    !(col(s"max_$c") < lo || col(s"min_$c") > hi)

  /** The partitions that MAY satisfy EVERY predicate in `preds`
    * (column, lo, hi): the conjunction of per-column interval tests —
    * each conjunct only removes provably-disjoint partitions, so the
    * intersection is still a conservative superset of the true set.
    * K index rows scanned, no data I/O. */
  def candidatePartitionsMulti(
      spark: SparkSession,
      indexPath: String,
      preds: Seq[(String, Column, Column)]): Seq[String] = {
    require(preds.nonEmpty, "need at least one range predicate")
    Versioned.readAsOf(spark, indexPath)
      .filter(preds.map { case (c, lo, hi) => intersects(c, lo, hi) }.reduce(_ && _))
      .select(col("pval")).distinct()
      .collect().map(_.getString(0)).toSeq
  }

  /** Multi-predicate zone-pruned read: open only partitions whose zone
    * row intersects EVERY range, plus any partition whose zone row is
    * stale or missing (tv ≠ manifest generation — [[lookupRange]]'s
    * freshness reconciliation), then apply the exact conjunctive
    * filter. Equals full-scan-and-filter by construction. */
  def lookupRangeMulti(
      spark: SparkSession,
      tablePath: String,
      indexPath: String,
      preds: Seq[(String, Column, Column)]): DataFrame = {
    require(preds.nonEmpty, "need at least one range predicate")
    val refs = Versioned
      .manifestRefs(spark, tablePath, Versioned.latestVersion(spark, tablePath))
    // one k-row collect: match verdict + freshness tag together (two
    // collects paid the index scan's fixed job cost twice)
    val idxRows = Versioned.readAsOf(spark, indexPath)
      .select(col("pval"), col("tv"),
        preds.map { case (c, lo, hi) => intersects(c, lo, hi) }
          .reduce(_ && _).as("m"))
      .collect()
    val matched: Set[String] =
      idxRows.filter(r => !r.isNullAt(2) && r.getBoolean(2)).map(_.getString(0)).toSet
    val tv: Map[String, Long] =
      idxRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val cand = refs.filter { case (pval, gen) =>
      matched(pval) || !tv.get(pval).contains(gen)
    }
    val base =
      if (cand.isEmpty)
        Versioned.readAsOf(spark, tablePath).limit(0).drop("__p")
      else Versioned.readRefs(spark, tablePath, cand).drop("__p")
    base.filter(preds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _))
  }

  /** The partitions that MAY hold a value in [lo, hi]: zone rows whose
    * [min_v, max_v] interval intersects it. K index rows scanned, no
    * data I/O; NULL min/max (all-NULL partition) yields NULL in the
    * predicate and drops — conservative either way. Index-only view,
    * NO freshness reconciliation against the table manifest — use
    * [[lookupRange]] for reads that must stay exact under concurrent
    * commits. */
  def candidatePartitions(
      spark: SparkSession, indexPath: String, lo: Column, hi: Column): Seq[String] =
    Versioned.readAsOf(spark, indexPath)
      .filter(!(col("max_v") < lo || col("min_v") > hi))
      .select(col("pval")).distinct()
      .collect().map(_.getString(0)).toSeq

  /** Zone-pruned range read: resolve the table's CURRENT manifest,
    * open ONLY candidate partitions' directories, then apply the exact
    * range filter. Equals full-scan-and-filter by construction —
    * INCLUDING under a concurrent commitIndexed: a reader landing
    * between the transaction's two applies could pair a newer table
    * with an understated zone row, so any partition whose manifest
    * generation differs from its zone row's `tv` (or that has no zone
    * row) is a candidate UNCONDITIONALLY — staleness can only widen
    * the read, never wrongly prune. */
  def lookupRange(
      spark: SparkSession,
      tablePath: String,
      indexPath: String,
      valCol: String,
      lo: Column,
      hi: Column): DataFrame = {
    val refs = Versioned
      .manifestRefs(spark, tablePath, Versioned.latestVersion(spark, tablePath))
    // one k-row collect: match verdict + freshness tag together (two
    // collects paid the index scan's fixed job cost twice); a NULL
    // verdict (all-NULL partition) reads as unmatched, exactly as the
    // former filter() dropped it — conservative either way
    val idxRows = Versioned.readAsOf(spark, indexPath)
      .select(col("pval"), col("tv"),
        (!(col("max_v") < lo || col("min_v") > hi)).as("m"))
      .collect()
    val matched: Set[String] =
      idxRows.filter(r => !r.isNullAt(2) && r.getBoolean(2)).map(_.getString(0)).toSet
    val tv: Map[String, Long] =
      idxRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val cand = refs.filter { case (pval, gen) =>
      matched(pval) || !tv.get(pval).contains(gen)
    }
    val base =
      if (cand.isEmpty)
        Versioned.readAsOf(spark, tablePath).limit(0).drop("__p")
      else Versioned.readRefs(spark, tablePath, cand).drop("__p")
    base.filter(col(valCol) >= lo && col(valCol) <= hi)
  }
}
