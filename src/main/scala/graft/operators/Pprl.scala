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

  /** Per-side blocking codes (k, bk): md5 of the name's first
    * `blockLen` characters under a shared salt. Each party runs this on
    * ITS OWN plaintext; only the hashed code crosses the boundary, so
    * the linkage job ([[diceMatchEncoded]]) never sees a name. (A
    * phonetic code like Soundex, salted the same way, slots in here
    * unchanged.) */
  def blockingCodes(
      df: DataFrame,
      key: String,
      name: String,
      blockLen: Int = 2,
      salt: String = "pprl-block"): DataFrame =
    df.select(col(key).as("k"),
      md5(concat(lit(s"$salt:"), lower(substring(col(name), 1, blockLen)))).as("bk"))

  /** Dice-coefficient linkage over PRE-ENCODED inputs — the form whose
    * signature matches the privacy claim: each party supplies only its
    * CLK positions (k, pos) from [[clk]] and its hashed blocking codes
    * (k, bk) from [[blockingCodes]], both computed on the party's own
    * side, so no plaintext ever reaches the linkage job. Candidates are
    * pairs sharing a blocking code (never all-pairs); emits
    * (ka, kb, n_common, na, nb, dice) for pairs with dice ≥ threshold. */
  def diceMatchEncoded(
      pa: DataFrame,
      blockA: DataFrame,
      pb: DataFrame,
      blockB: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val ca = pa.groupBy(col("k")).agg(count(lit(1)).as("na"))
    val cb = pb.groupBy(col("k")).agg(count(lit(1)).as("nb"))
    val cand = blockA.select(col("k").as("ka"), col("bk"))
      .join(blockB.select(col("k").as("kb"), col("bk")), Seq("bk"))
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

  /** Single-job convenience wrapper: encodes both sides and links them
    * in one session. This is a DEMO of the scoring scheme, not the
    * deployment shape — it requires both parties' plaintext co-located,
    * which a real PPRL deployment forbids. There, each party runs
    * [[clk]] + [[blockingCodes]] locally and ships only the encodings
    * to [[diceMatchEncoded]]. */
  def diceMatch(
      a: DataFrame,
      b: DataFrame,
      key: String,
      name: String,
      bits: Int = 64,
      hashes: Int = 2,
      blockLen: Int = 2,
      threshold: Double = 0.7): DataFrame =
    diceMatchEncoded(
      clk(a, key, name, bits, hashes), blockingCodes(a, key, name, blockLen),
      clk(b, key, name, bits, hashes), blockingCodes(b, key, name, blockLen),
      threshold)
}
