package graft.operators

import org.apache.spark.sql.SparkSession

/** Stats-driven JOIN-ORDER advisor — the planning consumer that closes
  * the [[StatsStore]] loop: reads NOTHING but stats rows (per-partition
  * row counts + mergeable HLL NDV registers) and ranks the candidate
  * first joins of a join chain by the textbook output estimate
  * |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B), greedily extending left-deep.
  * The estimate every CBO starts from (Selinger '79), fed here by
  * incrementally-maintained stats instead of a planning-time ANALYZE
  * scan — at 100 TB the advisor's cost is a k-row fold of each stats
  * table, while the decision it informs (which join runs first, what
  * gets broadcast) moves hours.
  *
  * Determinism: the register arrays are md5-derived and max-merged, so
  * estimates — and therefore the chosen order — are bit-reproducible
  * across engines (the k46 gate hash-proves the ranking against a SQL
  * recomputation of the same registers). Downstream-join estimates use
  * the standard containment assumption (the intermediate inherits the
  * base table's key NDV); like every CBO estimate they are a RANKING
  * signal, not a cardinality promise — the gate reports estimated and
  * ACTUAL rows side by side.
  */
object JoinAdvisor {

  /** One relation in the chain: its stats store and the join keys it
    * exposes (column name in the stats rows). */
  final case class Rel(name: String, statsPath: String)

  /** A candidate first join: left rel/key vs right rel/key. */
  final case class Candidate(label: String,
      left: Rel, leftKey: String, right: Rel, rightKey: String)

  /** Rank candidates by estimated output rows, ascending — the advisor
    * picks `ranked.head`. Driver-sized: two stats folds per candidate,
    * no data-table I/O. Returns (label, estRows) pairs sorted by
    * (estRows, label) so ties break deterministically. */
  def rank(spark: SparkSession, cands: Seq[Candidate]): Seq[(String, Double)] =
    cands.map { c =>
      c.label -> StatsStore.estimateJoinRows(
        spark, c.left.statsPath, c.leftKey, c.right.statsPath, c.rightKey)
    }.sortBy { case (l, e) => (e, l) }
}
