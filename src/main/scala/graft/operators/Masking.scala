package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level masking policies — the ENFORCEMENT half of data
  * governance ([[graft.plans.ColumnLineage.sensitiveReach]] finds where
  * sensitive values flow; this makes the protected VIEW of a table that
  * untrusted consumers read). Three standard policy shapes:
  *
  *   - [[hash]]: deterministic SHA-256 pseudonymization — joins and
  *     group-bys on the masked column still work (same input, same
  *     token) but values don't reverse. Salt it for non-linkability
  *     across releases.
  *   - [[redact]]: constant replacement — for free-text columns where
  *     even a pseudonym leaks (addresses, comments).
  *   - [[generalizeNumeric]]: bucket to a step's lower bound via
  *     floor-division in exact integer units — the k-anonymity
  *     generalization move (dq2's audit counts what this produces).
  *     Floor (not truncate-toward-zero) so negative values land in the
  *     bucket BELOW zero, keeping buckets uniform across the sign
  *     boundary — and keeping engine parity (SQL floor division).
  *
  * Pure column transforms: masking composes into any plan, pushes
  * through Catalyst like any projection, and costs one codegen'd pass. */
object Masking {

  def hash(c: Column): Column = sha2(c.cast("string"), 256)

  def redact: Column = lit("REDACTED")

  /** Lower bound of `c`'s `step`-sized bucket: `c - pmod(c, step)`,
    * computed in the column's OWN arithmetic (integer or decimal stays
    * exact — no double round-trip, so values beyond 2^53 still land in
    * the right bucket). `pmod` is non-negative by definition, which is
    * exactly floor semantics: -5 buckets to -step, not 0, keeping
    * buckets uniform across the sign boundary and matching SQL floor
    * division on both engines. */
  def generalizeNumeric(c: Column, step: Long): Column =
    (c - pmod(c, lit(step))).cast("long")

  /** Apply named per-column policies; unlisted columns pass through. */
  def mask(df: DataFrame, policies: Map[String, Column => Column]): DataFrame =
    df.select(df.columns.toIndexedSeq.map { c =>
      policies.get(c).map(p => p(col(c)).as(c)).getOrElse(col(c))
    }: _*)
}
