package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY.md §4 physical checklist). AQE's
  * skew-join split handles sort-merge skew automatically; explicit
  * salting remains the tool for pathological single-key skew on
  * shuffle-hash paths or when the small side must be replicated anyway.
  */
object SkewTools {

  /** Salted equi-join of a skewed `big` frame against a `small` frame:
    * each big row picks a deterministic salt in [0, salt) (hash of the
    * whole row — reproducible, no rand()), the small side is replicated
    * `salt` times, and the join key becomes (key, salt). One hot key's
    * rows thereby spread across `salt` reducers instead of one.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(hash(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Split a frame into (valid, rejected) by a predicate — the engine
    * form of the reference's warn-and-skip (rows are never thrown away
    * silently; the reject side is countable/loggable/sinkable).
    * Null predicate results land in `rejected`.
    */
  final case class Split(valid: DataFrame, rejected: DataFrame)

  def validate(df: DataFrame, cond: Column): Split =
    Split(df.filter(cond), df.filter(!coalesce(cond, lit(false))))
}
