package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

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
}
