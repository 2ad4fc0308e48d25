package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string-match join (entity resolution): pairs whose
  * character n-gram Jaccard similarity clears a threshold.
  *
  * Scale design — the inverted-index shape shared with t18/d2: each
  * side's strings decompose into distinct positional n-grams ONCE, the
  * sides meet with an equi-join per shared gram (never a string-distance
  * nested loop), per-pair intersection counts come from one aggregate,
  * and Jaccard needs only the two (broadcastable) per-key gram counts.
  * The probe side is typically the small one (new records against a
  * master table); hot grams are AQE-skew-splittable because the join is
  * a plain hash join on the gram.
  */
object FuzzyJoin {

  private def grams(df: DataFrame, key: String, text: String, n: Int, ka: String) =
    df.select(col(key).as(ka), col(text).as("__t"))
      // strings shorter than n have no grams (Spark's sequence would
      // otherwise run DESCENDING for stop < start)
      .filter(length(col("__t")) >= n)
      .select(col(ka),
        explode(sequence(lit(1), length(col("__t")) - (n - 1))).as("__i"), col("__t"))
      .select(col(ka), expr(s"substring(__t, __i, $n)").as("q"))
      .distinct()

  /** (ka, kb, jaccard) for every cross pair with n-gram Jaccard >=
    * `threshold`. `a` is the probe side (small), `b` the master side. */
  def qgramJoin(
      a: DataFrame, aKey: String, aText: String,
      b: DataFrame, bKey: String, bText: String,
      n: Int, threshold: Double): DataFrame = {
    val ga = grams(a, aKey, aText, n, "ka")
    val gb = grams(b, bKey, bText, n, "kb")
    val sa = ga.groupBy(col("ka")).agg(count(lit(1)).as("ca"))
    val sb = gb.groupBy(col("kb")).agg(count(lit(1)).as("cb"))
    val inter = gb.join(broadcast(ga), Seq("q"))
      .groupBy(col("ka"), col("kb"))
      .agg(count(lit(1)).as("i"))
    val jac = col("i").cast("double") / (col("ca") + col("cb") - col("i"))
    inter
      .join(broadcast(sa), Seq("ka"))
      .join(sb, Seq("kb"))
      .filter(jac >= threshold)
      .select(col("ka"), col("kb"), jac.as("jaccard"))
  }

  /** (ka, kb, dist) for pairs sharing >= `minShared` distinct n-grams
    * whose Levenshtein distance is <= `maxDist`.
    *
    * The quadratic edit-distance kernel (O(|s|·|t|) per pair) runs ONLY
    * on inverted-index candidates, after the free length prefilter
    * (|len(a) − len(b)| > maxDist implies dist > maxDist) — at corpus
    * scale the candidate generation is the same hash-join shape as
    * [[qgramJoin]] and the expensive verify touches a vanishing fraction
    * of the cross product. `a` is the probe side (small, broadcast). */
  def editDistanceJoin(
      a: DataFrame, aKey: String, aText: String,
      b: DataFrame, bKey: String, bText: String,
      n: Int, minShared: Int, maxDist: Int): DataFrame = {
    val ga = grams(a, aKey, aText, n, "ka")
    val gb = grams(b, bKey, bText, n, "kb")
    val cand = gb.join(broadcast(ga), Seq("q"))
      .groupBy(col("ka"), col("kb"))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= minShared)
      .select(col("ka"), col("kb"))
    cand
      .join(broadcast(a.select(col(aKey).as("ka"), col(aText).as("__ta"))), Seq("ka"))
      .join(b.select(col(bKey).as("kb"), col(bText).as("__tb")), Seq("kb"))
      .filter(abs(length(col("__ta")) - length(col("__tb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__ta"), col("__tb")))
      .filter(col("dist") <= maxDist)
      .select(col("ka"), col("kb"), col("dist"))
  }
}
