package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search over a directed edge list: hop
  * distance from a seed set, bounded depth.
  *
  * Each round expands ONLY the frontier (the nodes first reached in the
  * previous round) — distance labels can never improve after a node is
  * reached, so settled nodes stay out of the join. Per round the cost is
  * one equi-join frontier ⋈ edges plus a partial-aggregated min — the
  * per-round work is proportional to the edges incident to the frontier,
  * not to the graph, which is what makes `rounds` passes viable on a
  * 100 TB edge list. Labels stage to parquet every round (label frames
  * are node-sized, tiny next to the edges) so lineage stays flat across
  * iterations; callers pass a *materialized* edge frame for the same
  * reason ([[Components]]' discipline).
  *
  * Hop distances need per-round relaxation (unlike component labels,
  * they cannot pointer-jump — shortcutting changes the metric), so
  * depth-bounded BFS is the scale-honest contract: `rounds` is an
  * explicit budget, and every returned distance is exact.
  */
object Bfs {

  /** (id, dist) for every node within `rounds` hops of a seed, where
    * `dist` = exact minimum hop count (seeds are dist 0).
    *
    * @param edges directed (u, v) pairs; pre-union both directions for
    *              an undirected graph, pre-materialize (parquet stage)
    * @param seeds (id) rows; deduplicated here
    */
  def distances(
      edges: DataFrame,
      seeds: DataFrame,
      rounds: Int,
      stagePath: String): DataFrame = {
    val spark = edges.sparkSession
    // window 1: only the latest label round is ever referenced again
    val chain = new graft.Scratch.RoundChain(spark)
    def stage(df: DataFrame, name: String): DataFrame =
      chain.stage(df, s"$stagePath/$name")
    var labels = stage(
      seeds.select(col("id")).distinct().select(col("id"), lit(0).as("dist")),
      "l0")
    var frontier = labels
    var r = 1
    while (r <= rounds && !frontier.isEmpty) {
      val reached = frontier
        .join(edges, frontier("id") === edges("u"))
        .select(edges("v").as("id"), (col("dist") + 1).as("dist"))
      labels = stage(
        labels.unionByName(reached)
          .groupBy(col("id")).agg(min(col("dist")).as("dist")),
        s"l$r")
      // exactly the nodes first reached this round: any improvement at
      // round r lands at dist r (smaller dists were already settled)
      frontier = labels.filter(col("dist") === r)
      r += 1
    }
    labels
  }

  /** PER-SOURCE hop distances: (src, id, dist) for every (seed, node)
    * pair within `rounds` hops — the label is keyed by the seed, so each
    * seed runs its own BFS simultaneously in one job per round (the
    * landmark/sampled-sources pattern behind closeness/harmonic
    * centrality). Same frontier-only discipline as [[distances]]; state
    * and per-round join work scale with (number of seeds × their
    * neighborhoods), which is why the seed set is an explicit sample —
    * all-sources exact closeness at 100 TB is the quadratic no-go that
    * sketch approaches (ANF/HyperBall) exist to replace. */
  def perSourceDistances(
      edges: DataFrame,
      seeds: DataFrame,
      rounds: Int,
      stagePath: String): DataFrame = {
    val spark = edges.sparkSession
    // window 1: only the latest label round is ever referenced again
    val chain = new graft.Scratch.RoundChain(spark)
    def stage(df: DataFrame, name: String): DataFrame =
      chain.stage(df, s"$stagePath/$name")
    var labels = stage(
      seeds.select(col("id")).distinct()
        .select(col("id").as("src"), col("id"), lit(0).as("dist")),
      "s0")
    var frontier = labels
    var r = 1
    while (r <= rounds && !frontier.isEmpty) {
      val reached = frontier
        .join(edges, frontier("id") === edges("u"))
        .select(col("src"), edges("v").as("id"), (col("dist") + 1).as("dist"))
      labels = stage(
        labels.unionByName(reached)
          .groupBy(col("src"), col("id")).agg(min(col("dist")).as("dist")),
        s"s$r")
      frontier = labels.filter(col("dist") === r)
      r += 1
    }
    labels
  }

  /** PER-SOURCE hop distances via SEED BITMASKS — the MS-BFS
    * formulation (Then et al., "The More the Merrier: Efficient
    * Multi-Source Graph Traversal", VLDB 2015): each seed owns one bit
    * in a fixed-width mask carried per NODE, so one round advances ALL
    * seeds' frontiers with a single edges ⋈ node-mask join + a
    * per-word `bit_or` aggregate. Per-round cost is O(|E|) —
    * INDEPENDENT of the seed count — where the label-relaxation form
    * ([[perSourceDistances]]) pays O(Σ_frontier deg) per (seed, node)
    * pair: on the co-purchase graph (20k nodes / 2.4M directed edges /
    * 207 seeds) that is 2.4M vs ~480M join rows in round 3 (measured
    * 43 s → ~4 s at sf0.1 for g14). Same (src, id, dist) contract and
    * identical results — the relaxation-form DuckDB oracle doubles as
    * a cross-validation of the bitmask algebra.
    *
    * Masks use 60 bits per BIGINT word (bit 63 would flip the sign —
    * engine-portable shifts stay below it); the word count adapts to
    * the seed count. Frontier math is pure bitwise algebra: newly
    * reached F_d = (OR over in-neighbors of F_{d-1}) AND NOT R_{d-1};
    * cumulative R_d = R_{d-1} OR F_d. Node-mask frames are node-sized
    * (tiny next to the edges) and parquet-staged per round. The final
    * (src, id, dist) expansion joins the broadcast seed-index table
    * once per depth level — O(nodes × seeds) rows, produced once, not
    * per round. */
  def perSourceDistancesBitmask(
      edges: DataFrame,
      seeds: DataFrame,
      rounds: Int,
      stagePath: String): DataFrame = {
    val spark = edges.sparkSession
    def stage(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$stagePath/$name")
      spark.read.parquet(s"$stagePath/$name")
    }
    // only the cumulative-reach rounds supersede each other; the f_d
    // frontier levels stay referenced by the final expansion and must
    // NOT chain
    val reachChain = new graft.Scratch.RoundChain(spark)
    val bitsPerWord = 60
    // deterministic seed → bit index without a partition-less window:
    // idx = |{seeds with smaller id}| (seed set is dimension-sized)
    val sd = seeds.select(col("id")).distinct()
    val idx = sd.as("a")
      .join(sd.as("b"), col("b.id") < col("a.id"), "left")
      .groupBy(col("a.id").as("id"))
      .agg(count(col("b.id")).as("idx"))
    val nSeeds = sd.count()
    val nWords = math.max(1, ((nSeeds + bitsPerWord - 1) / bitsPerWord).toInt)
    val words = (0 until nWords).map(w => s"m$w")
    val seedMasks = idx.select(
      (col("id") +:
        words.zipWithIndex.map { case (m, w) =>
          when(floor(col("idx") / bitsPerWord) === w,
            expr(s"shiftleft(CAST(1 AS BIGINT), CAST(idx % $bitsPerWord AS INT))"))
            .otherwise(0L).as(m)
        }): _*)
    // R: cumulative reached mask per node; F: this round's new mask
    var reach = reachChain.stage(seedMasks, s"$stagePath/r0")
    var frontier = reach
    val levels = scala.collection.mutable.Buffer.empty[DataFrame]
    for (d <- 1 to rounds) {
      val gathered = edges
        .join(frontier.withColumnRenamed("id", "u"), Seq("u"))
        .groupBy(col("v").as("id"))
        .agg(words.map(m => expr(s"bit_or($m)").as(m)).head,
          words.map(m => expr(s"bit_or($m)").as(m)).tail: _*)
      val fNew = stage(
        gathered.join(
            reach.select((col("id") +: words.map(m => col(m).as(s"r_$m"))): _*),
            Seq("id"), "left")
          .select((col("id") +: words.map(m =>
            expr(s"$m & ~coalesce(r_$m, CAST(0 AS BIGINT))").as(m))): _*)
          .filter(words.map(m => col(m) =!= 0L).reduce(_ || _)),
        s"f$d")
      levels += fNew.withColumn("dist", lit(d))
      reach = reachChain.stage(
        reach.select((col("id") +: words.map(m => col(m).as(s"r_$m"))): _*)
          .join(fNew.select((col("id") +: words.map(m => col(m).as(s"f_$m"))): _*),
            Seq("id"), "full_outer")
          .select((col("id") +: words.map(m =>
            expr(s"coalesce(r_$m, CAST(0 AS BIGINT)) | coalesce(f_$m, CAST(0 AS BIGINT))")
              .as(m))): _*),
        s"$stagePath/r$d")
      frontier = fNew
    }
    // expand (node, mask, dist) → (src, id, dist) against the broadcast
    // seed-index table; seeds themselves are dist 0
    val seedBits = idx.select(col("id").as("src"),
      floor(col("idx") / bitsPerWord).cast("int").as("w"),
      (col("idx") % bitsPerWord).cast("int").as("b"))
    val level0 = seedMasks.select(col("id")).withColumn("dist", lit(0))
      .select(col("id").as("src"), col("id"), col("dist"))
    val expanded = levels.map { lv =>
      val melted = lv.select(col("id"), col("dist"),
        posexplode(array(words.map(col): _*)).as(Seq("w", "mask")))
      melted.join(broadcast(seedBits), Seq("w"))
        .filter(expr(s"(shiftright(mask, b) & 1) = 1"))
        .select(col("src"), col("id"), col("dist"))
    }.reduce(_ unionByName _)
    level0.unionByName(expanded)
  }

  /** Weighted single-source(-set) shortest paths, Bellman-Ford style:
    * (id, dist) = exact minimum total edge cost reachable from a seed
    * within `rounds` relaxations (seeds are dist 0).
    *
    * Unlike hop-count BFS a settled node CAN improve later (a longer
    * but cheaper path), so the frontier is the set of nodes whose label
    * improved in the previous round — the Bellman-Ford invariant: only
    * an improved node can improve its neighbors. Per round: one
    * frontier ⋈ edges equi-join + a partial-aggregated min + one
    * node-sized join against the previous labels to detect improvement.
    * Work tracks the improved set's incident edges, never the graph.
    * Costs are positive integers, so every returned distance is exact
    * and a round-unrolled SQL oracle (full relaxation, min-equivalent)
    * matches bit-for-bit.
    *
    * @param edges directed (u, v, cost) rows, cost a positive integer;
    *              pre-union both directions for an undirected graph and
    *              pre-materialize (parquet stage)
    */
  def weightedDistances(
      edges: DataFrame,
      seeds: DataFrame,
      rounds: Int,
      stagePath: String): DataFrame = {
    val spark = edges.sparkSession
    // window 2: the improvement probe still reads round r−1 after
    // round r lands (frontier = next ⋈ previous labels)
    val chain = new graft.Scratch.RoundChain(spark, window = 2)
    def stage(df: DataFrame, name: String): DataFrame =
      chain.stage(df, s"$stagePath/$name")
    var labels = stage(
      seeds.select(col("id")).distinct().select(col("id"), lit(0L).as("dist")),
      "w0")
    var frontier = labels
    var r = 1
    while (r <= rounds && !frontier.isEmpty) {
      val reached = frontier
        .join(edges, frontier("id") === edges("u"))
        .select(edges("v").as("id"), (col("dist") + col("cost")).as("dist"))
      val next = stage(
        labels.unionByName(reached)
          .groupBy(col("id")).agg(min(col("dist")).as("dist")),
        s"w$r")
      frontier = next.join(
          labels.select(col("id"), col("dist").as("__old")), Seq("id"), "left_outer")
        .filter(col("__old").isNull || col("dist") < col("__old"))
        .select(col("id"), col("dist"))
      labels = next
      r += 1
    }
    labels
  }
}
