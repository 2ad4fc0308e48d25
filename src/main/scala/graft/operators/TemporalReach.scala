package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-respecting reachability over a temporal edge list — the
  * temporal counterpart of [[Bfs]]: an edge (src, dst, t) is
  * traversable only at or after the moment you ARRIVE at src, so the
  * reachable set respects edge ORDER, not just connectivity (a static
  * BFS over the same edges overcounts whenever a path's timestamps
  * decrease — TemporalReachSpec pins exactly that case).
  *
  * Semantics: arrival(seed) is given; each round relaxes
  * arrival(dst) = min(arrival(dst), min over in-edges e with
  * e.t ≥ arrival(src) of e.t). Min-merge is idempotent and
  * order-independent, so rounds converge monotonically and a replayed
  * round is harmless. After `rounds` rounds the result covers every
  * time-respecting path of ≤ `rounds` hops (arrivals may still shrink
  * with more rounds until the fixed point).
  *
  * Scale shape: each round is one equi-join of the (landed) edge list
  * against the label table on src — the time predicate rides the hash
  * join as a residual, never a range-only join — plus one partial-
  * aggregated min per node. Labels restage per round through a
  * [[graft.Scratch.RoundChain]] (window 1: only the latest round is
  * read), so a 100 TB edge list pays h equi-joins, never Θ(n·m)
  * per-source walks, and superseded round tables are freed eagerly.
  */
object TemporalReach {

  /** Earliest time-respecting arrival per node within `rounds` hops.
    * `edges`: (src, dst, t) — should be a LANDED frame (rounds re-read
    * it). `seeds`: (id, arr) start times. Returns (id, arr). */
  def earliestArrival(
      edges: DataFrame,
      seeds: DataFrame,
      rounds: Int,
      stagePath: String): DataFrame = {
    val s = edges.sparkSession
    val chain = new graft.Scratch.RoundChain(s)
    var labels = chain.stage(seeds.select(col("id"), col("arr")), s"$stagePath/l0")
    for (k <- 1 to rounds) {
      val cand = edges
        .join(labels, edges("src") === labels("id") && edges("t") >= labels("arr"))
        .select(col("dst").as("id"), col("t").as("arr"))
      labels = chain.stage(
        labels.unionByName(cand).groupBy(col("id")).agg(min(col("arr")).as("arr")),
        s"$stagePath/l$k")
    }
    labels
  }
}
