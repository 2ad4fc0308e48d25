package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter membership screen: a reference set (eval
  * probes, banned fingerprints, seen-document hashes) is compressed into
  * an m-bit filter that rides the PLAN as one literal — corpus-side
  * membership tests are then a pure map-side projection: no join, no
  * shuffle, no broadcast hash table of the full reference set. At 100 TB
  * the probe cost per row is k array lookups against an 8 KB bitset,
  * and the filter itself is buildable from a reference set of any size
  * (capped by m, not by the set's cardinality).
  *
  * False positives are an explicit, DETERMINISTIC part of the contract:
  * positions are md5-derived (no RNG, no seed), so the exact same
  * positives fall out on every engine — the d9 oracle reproduces them
  * in SQL, making even the FP set hash-gatable.
  *
  * m = 2^16 bits (the first 4 md5 hex chars ARE the position — no
  * modulo), k configurable (d9 uses 2).
  */
object BloomScreen {

  val mBits = 65536

  /** Position of hash j for value `s`: hex32 of md5("j:" + s) truncated
    * to 16 bits. Spark conv(hex) ≡ DuckDB CAST('0x…' AS BIGINT). */
  def position(j: Int, s: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), s)), 1, 4), 16, 10).cast("int")

  /** Collect the filter as a boolean array (m bits ≤ 8 KB — a bounded
    * driver-side reduction like k-means centroids, NEVER corpus-sized:
    * at most m distinct positions come back regardless of |values|). */
  def buildBits(values: DataFrame, valueCol: String, k: Int): Array[Boolean] = {
    val posCols = (0 until k).map(j => position(j, col(valueCol)))
    val bits = new Array[Boolean](mBits)
    values.select(explode(array(posCols: _*)).as("p")).distinct()
      .collect().foreach(r => bits(r.getInt(0)) = true)
    bits
  }

  /** Membership test column: true iff ALL k positions of `s` are set.
    * The bitset enters the plan as ONE array literal, so the test stays
    * inside whole-stage codegen with zero per-row allocation. */
  def hit(bits: Array[Boolean], s: Column, k: Int): Column = {
    val bs = typedlit(bits.toSeq)
    (0 until k).map(j => element_at(bs, position(j, s) + 1)).reduce(_ && _)
  }
}
