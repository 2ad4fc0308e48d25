package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for inner-join views over append-only
  * inputs (the classic delta-join rewrite):
  *
  *   V      = A ⋈ B
  *   V_new  = V ∪ ΔV,   ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
  *
  * Design for 100 TB: the whole point is that `A ⋈ B` is NEVER
  * recomputed — each refresh touches the old table only where it joins a
  * delta. Deltas are tiny relative to the base tables (a day of feed vs
  * years of history), so both cross terms broadcast the delta side and
  * the base tables stream through map-side hash joins with their
  * pushed-down scan filters intact; the only shuffle-sized work left is
  * ΔA⋈ΔB, which is delta×delta. Appending ΔV to the landed view is a
  * blind `mode(append)` parquet write — no rewrite of existing files.
  *
  * Scope: insert-only deltas (append streams / immutable facts). Updates
  * and deletes need keyed multiplicity bookkeeping — that path is served
  * by [[Scd2]] + [[SnapshotDiff]] instead.
  *
  * Reference anchor: the reference re-runs its full join pipeline each
  * ETL window (/root/reference/src/etl-square-orders.ts) — this operator
  * is the same view kept fresh at delta cost.
  */
object Ivm {

  /** ΔV for V = A ⋈ B on `keys`, given old snapshots and insert-only
    * deltas. With `broadcastDeltas` (default), the two base⋈delta terms
    * hint the delta side for a map-side join; disable when deltas can be
    * base-sized (AQE then picks the strategy from runtime sizes).
    */
  def deltaJoin(
      aOld: DataFrame, dA: DataFrame,
      bOld: DataFrame, dB: DataFrame,
      keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame = {
    def hint(d: DataFrame) = if (broadcastDeltas) broadcast(d) else d
    hint(dA).join(bOld, keys)
      .unionAll(aOld.join(hint(dB), keys))
      .unionAll(dA.join(dB, keys))
  }

  /** The refreshed view: old view plus the delta increment. */
  def maintain(
      vOld: DataFrame,
      aOld: DataFrame, dA: DataFrame,
      bOld: DataFrame, dB: DataFrame,
      keys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame =
    vOld.unionAll(deltaJoin(aOld, dA, bOld, dB, keys, broadcastDeltas))

  /** RETRACTION-aware aggregate maintenance — the updates-and-deletes
    * path the join IVM above deliberately excludes. `state` is a
    * materialized per-key (count, sum) aggregate; `cdc` carries one row
    * per change with `opCol` ∈ {"I","U","D"}, the post-image in `newCol`
    * (I/U) and the pre-image in `oldCol` (U/D). Count and sum are the
    * self-maintainable aggregates: a delete retracts (−1, −old), an
    * update contributes (0, new−old), an insert adds (+1, +new) — no
    * base-table access, ever. Keys whose count reaches zero leave the
    * state (so a fully-retracted group disappears exactly as a
    * recomputation would drop it). min/max are NOT self-maintainable
    * under deletes (a retracted extremum forces a per-key rescan) — by
    * design out of scope here.
    *
    * Scale: refresh cost is O(Δ ∪ touched keys) — the CDC batch partial-
    * aggregates to one (Δcount, Δsum) row per touched key before a
    * single key-join against the state; the state table is never
    * re-aggregated. Exactness: caller supplies integer/decimal value
    * columns, so retractions cancel bit-for-bit (double sums would
    * drift under retraction).
    */
  def retractableAgg(
      state: DataFrame,
      cdc: DataFrame,
      keys: Seq[String],
      opCol: String, newCol: String, oldCol: String,
      cntCol: String = "cnt", sumCol: String = "s"): DataFrame = {
    val op = col(opCol)
    val delta = cdc.groupBy(keys.map(col).toIndexedSeq: _*).agg(
      sum(when(op === "I", 1L).when(op === "D", -1L).otherwise(0L)).as("__dc"),
      sum(when(op === "I", col(newCol))
        .when(op === "D", -col(oldCol))
        .otherwise(col(newCol) - col(oldCol))).as("__ds"))
    state.join(delta, keys, "full_outer")
      .select((keys.map(col) ++ Seq(
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__dc"), lit(0L))).as(cntCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__ds"), lit(0L))).as(sumCol)))
        .toIndexedSeq: _*)
      .filter(col(cntCol) > 0)
  }
}
