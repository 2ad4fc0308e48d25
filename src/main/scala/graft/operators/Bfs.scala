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
    def stage(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$stagePath/$name")
      spark.read.parquet(s"$stagePath/$name")
    }
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
    def stage(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$stagePath/$name")
      spark.read.parquet(s"$stagePath/$name")
    }
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
    def stage(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$stagePath/$name")
      spark.read.parquet(s"$stagePath/$name")
    }
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
