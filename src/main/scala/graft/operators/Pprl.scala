package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving record linkage (PPRL) via cryptographic long-term
  * key (CLK) Bloom encodings — the Schnell/Bachteler/Reiher scheme: each
  * party encodes its quasi-identifier (here a name) into a fixed-width
  * Bloom bitset (every character bigram sets `hashes` md5-derived bit
  * positions), parties share ONLY the bitsets, and pairs match on the
  * Dice coefficient of their bitsets — plaintext never crosses the
  * trust boundary, yet typos/perturbations degrade Dice gracefully
  * instead of breaking equality.
  *
  * Representation: a bitset is its set of occupied positions in long
  * format (k, pos) — sparse, joinable, and exact (intersection = one
  * equi-join + count; no bit twiddling, no UDF). Determinism: positions
  * are md5-derived, so a SQL oracle reproduces every bit and every
  * Dice score bit-for-bit.
  *
  * Scale shape: encoding is one explode + distinct per source;
  * candidate pairs come from a BLOCKING key (never all-pairs); the
  * intersection join fans each candidate pair out by its ≤ `bits`
  * positions — work tracks candidates × bitset width, not corpus².
  */
object Pprl {

  /** CLK encode: distinct Bloom positions per record. `df` must expose
    * `key` and `name`; emits (k, pos). Names shorter than one bigram
    * encode to the empty set (dropped — they can never match anyway). */
  def clk(
      df: DataFrame,
      key: String,
      name: String,
      bits: Int = 64,
      hashes: Int = 2): DataFrame = {
    val g = df.select(col(key).as("k"), col(name).as("nm"))
      .filter(length(col("nm")) >= 2)
      .select(col("k"), explode(
        expr("transform(sequence(1, length(nm) - 1), i -> substring(nm, i, 2))")).as("g"))
      .distinct()
    (1 to hashes).map { h =>
      g.select(col("k"),
        (conv(substring(md5(concat(lit(s"$h:"), col("g"))), 1, 2), 16, 10)
          .cast("long") % bits).as("pos"))
    }.reduce(_ unionByName _).distinct()
  }

  /** Dice-coefficient linkage of two CLK-encoded sources. Candidates
    * are blocked on the first `blockLen` name characters (the blocking
    * key is computed per side BEFORE encoding — in a real deployment it
    * is a shared phonetic/prefix code, not plaintext). Emits
    * (ka, kb, n_common, na, nb, dice) for pairs with dice ≥ threshold. */
  def diceMatch(
      a: DataFrame,
      b: DataFrame,
      key: String,
      name: String,
      bits: Int = 64,
      hashes: Int = 2,
      blockLen: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val pa = clk(a, key, name, bits, hashes)
    val pb = clk(b, key, name, bits, hashes)
    val ca = pa.groupBy(col("k")).agg(count(lit(1)).as("na"))
    val cb = pb.groupBy(col("k")).agg(count(lit(1)).as("nb"))
    val cand = a
      .select(col(key).as("ka"), substring(col(name), 1, blockLen).as("bk"))
      .join(b.select(col(key).as("kb"), substring(col(name), 1, blockLen).as("bk")), Seq("bk"))
      .select(col("ka"), col("kb"))
    val inter = cand
      .join(pa.select(col("k").as("ka"), col("pos")), Seq("ka"))
      .join(pb.select(col("k").as("kb"), col("pos")), Seq("kb", "pos"))
      .groupBy(col("ka"), col("kb"))
      .agg(count(lit(1)).as("n_common"))
    val dice = lit(2.0) * col("n_common") / (col("na") + col("nb"))
    inter
      .join(ca.select(col("k").as("ka"), col("na")), Seq("ka"))
      .join(cb.select(col("k").as("kb"), col("nb")), Seq("kb"))
      .select(col("ka"), col("kb"), col("n_common"), col("na"), col("nb"),
        dice.as("dice"))
      .filter(col("dice") >= threshold)
  }
}
