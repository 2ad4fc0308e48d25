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

  private[graft] def grams(df: DataFrame, key: String, text: String, n: Int, ka: String) =
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

  /** All unordered pairs of distinct values of `nameCol` within edit
    * distance `k` (1 <= dist <= k), with COMPLETE candidate generation —
    * unlike [[editDistanceJoin]]'s caller-tuned `minShared` prefilter
    * (a recall/cost dial that can drop pairs), this blocking provably
    * loses nothing, so the result is identical to the naive all-pairs
    * nested loop (the `d12_fuzzy_name_match` DuckDB oracle certifies
    * exactly that).
    *
    * The bound is the q-gram count filter of Gravano et al., VLDB 2001
    * ("Approximate String Joins in a Database (Almost) for Free"): one
    * edit operation destroys at most q overlapping q-grams, so
    *
    *   ed(s, t) <= k  ⟹  |G(s) ⊓ G(t)| >= max(|s|, |t|) − q + 1 − k·q
    *
    * over the MULTISETS of q-grams (multiset semantics matter: "aaaa"
    * and "aa" share one distinct gram but two multiset copies).
    *
    * Execution shape, sized for a 100-TB corpus:
    *  - the join runs over DISTINCT strings — the dictionary is orders
    *    of magnitude smaller than the row count, and callers re-attach
    *    counts/payloads afterwards by broadcast;
    *  - multiset gram matching is an equi-join on 8-byte
    *    `xxhash64(gram, occurrence)` keys (the d2/d3 discipline: hash
    *    before the shuffle); occurrence-indexed keys make an equi-join
    *    match exactly min(count_a, count_b) times per gram;
    *  - the count filter runs as a partial-aggregated groupBy on the
    *    pair key BEFORE any levenshtein, so the quadratic blowup dies
    *    in the map-side combine, not in the verify stage;
    *  - strings too short for the filter to bite (max(|s|,|t|) <=
    *    q·(k+1)−1 makes the bound vacuous; both sides of such a pair
    *    are short, since the length filter caps the gap at k and
    *    q+k <= q·(k+1)) pair exactly within their length band via an
    *    equi-join on candidate length — a hash join over a domain
    *    bounded by |Σ|^(q·(k+1)), never a nested loop.
    */
  def fuzzyPairs(df: DataFrame, nameCol: String, k: Int, q: Int = 2): DataFrame = {
    require(k >= 1 && q >= 1, s"need k >= 1 and q >= 1, got k=$k q=$q")
    val names = df.select(col(nameCol).as("nm")).na.drop().distinct()
      .withColumn("len", length(col("nm")))

    val shortMax = q * (k + 1) - 1
    val short = names.filter(col("len") <= shortMax)
    val shortPairs = short
      .select(col("nm"), col("len"),
        explode(sequence(col("len") - k, col("len") + k)).as("lb"))
      .as("a")
      .join(short.as("b"), col("a.lb") === col("b.len") && col("a.nm") < col("b.nm"))
      .select(col("a.nm").as("name_a"), col("b.nm").as("name_b"),
        levenshtein(col("a.nm"), col("b.nm")).as("d"))
      .filter(col("d") <= k)

    val mgrams = names.filter(col("len") >= q)
      .select(col("nm"), col("len"),
        explode(expr(s"transform(sequence(1, len - ${q - 1}), i -> substring(nm, i, $q))")).as("g"))
      .groupBy(col("nm"), col("len"), col("g"))
      .agg(count(lit(1)).as("c"))
      .select(col("nm"), col("len"),
        explode(expr("transform(sequence(1, c), i -> xxhash64(g, i))")).as("gk"))

    val candidates = mgrams.as("a")
      .join(mgrams.as("b"),
        col("a.gk") === col("b.gk") && col("a.nm") < col("b.nm") &&
          abs(col("a.len") - col("b.len")) <= k)
      .groupBy(col("a.nm").as("name_a"), col("b.nm").as("name_b"),
        col("a.len").as("la"), col("b.len").as("lb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= greatest(col("la"), col("lb")) - lit(q - 1) - lit(k * q))
      // pairs with both sides short are the short bucket's (the count
      // filter can admit them too — emitting twice would duplicate)
      .filter(greatest(col("la"), col("lb")) > shortMax)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("d"))
      .filter(col("d") <= k)

    shortPairs.unionByName(candidates)
      .select(col("name_a"), col("name_b"), col("d").cast("long").as("dist"))
  }
}
