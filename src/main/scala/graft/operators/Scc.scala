package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact STRONGLY CONNECTED COMPONENTS over an explicit directed edge
  * list — the directed counterpart of [[Components]]' undirected CC
  * (label equality there says "some path exists"; here membership
  * requires reachability BOTH ways, which no single label propagation
  * can decide).
  *
  * Algorithm: iterative forward–backward min-label settle-and-remove.
  * Each outer round computes, over the still-unsettled subgraph,
  *   fwd(u) = min id u can REACH        (incl. u)
  *   bwd(u) = min id that can REACH u   (incl. u)
  * and settles every node with fwd(u) = bwd(u) = m: u reaches m and m
  * reaches u, so u ∈ SCC(m) — and SCC members share both labels
  * (mutually reachable nodes reach identical sets within the live
  * subgraph), so the whole component settles with scc_id = m at once.
  * Settled nodes and their edges leave the live subgraph; the round
  * repeats. Progress is guaranteed: the live subgraph's minimum id is
  * always its own fwd and bwd minimum, so its SCC settles every round.
  *
  * Scale shape: every inner propagation round is one equi-join
  * (edges ⋈ labels, hash-partitioned — never a nested loop) plus a
  * partial-aggregated min; labels stage to parquet between rounds so
  * round r never re-executes rounds 1..r−1's lineage (the LabelProp /
  * PageRank discipline). Labels are monotone non-increasing, so
  * convergence is a one-row sum comparison per round. Outer rounds are
  * bounded by the settle-chain depth (≤ #SCCs, usually far less since
  * every locally-minimal component settles in parallel); callers pass
  * graphs whose depth they can bound and `maxRounds` fails loudly
  * rather than spinning.
  */
object Scc {

  /** (n, lbl): min id reachable along `edges` (u→v ⇒ u can see v's
    * label) from each node of `nodes`, to fixpoint. */
  private def minLabel(
      nodes: DataFrame, edges: DataFrame, stage: String, maxInner: Int): DataFrame = {
    val spark = nodes.sparkSession
    val chain = new graft.Scratch.RoundChain(spark)
    var lab = chain.stage(nodes.select(col("n"), col("n").as("lbl")),
      s"$stage/round=0")
    var prevSum = lab.agg(sum(col("lbl"))).collect()(0).getLong(0)
    var r = 1
    while (r <= maxInner) {
      val viaEdge = edges
        .join(lab.select(col("n").as("v"), col("lbl").as("nl")), Seq("v"))
        .groupBy(col("u").as("n")).agg(min(col("nl")).as("cand"))
      val nxt = lab.join(viaEdge, Seq("n"), "left_outer")
        .select(col("n"),
          least(col("lbl"), coalesce(col("cand"), col("lbl"))).as("lbl"))
      lab = chain.stage(nxt, s"$stage/round=$r")
      val s = lab.agg(sum(col("lbl"))).collect()(0).getLong(0)
      if (s == prevSum) return lab // monotone ⇒ equal sum ⇒ fixpoint
      prevSum = s; r += 1
    }
    throw new IllegalStateException(
      s"min-label propagation did not converge in $maxInner rounds — " +
        "graph deeper than the caller's bound")
  }

  /** Decompose `edges0` (u, v) into strongly connected components:
    * returns (node, scc_id) covering every edge endpoint, where scc_id
    * is the component's minimum node id. */
  def strongComponents(edges0: DataFrame, maxRounds: Int = 32): DataFrame = {
    val spark = edges0.sparkSession
    val root = graft.Scratch.dir("scc-rounds")
    val edgeChain = new graft.Scratch.RoundChain(spark)
    val nodeChain = new graft.Scratch.RoundChain(spark)
    val accChain = new graft.Scratch.RoundChain(spark)
    var live = edgeChain.stage(
      edges0.select(col("u"), col("v")).filter(col("u") =!= col("v")).distinct(),
      s"$root/edges=0")
    var remaining = nodeChain.stage(
      live.select(col("u").as("n")).unionByName(live.select(col("v").as("n")))
        .distinct(),
      s"$root/nodes=0")
    // a node whose ONLY edges are self-loops never enters the min-label
    // rounds (self-edges are filtered above), but it IS a legitimate
    // singleton SCC — it reaches itself both ways — so it joins the
    // result directly instead of silently dropping out. Staged PLAINLY
    // (not through a chain): the result frame reads it after every
    // round table has been superseded and reaped.
    val selfOnly = {
      val so = edges0.select(col("u").as("n"))
        .unionByName(edges0.select(col("v").as("n"))).distinct()
        .join(remaining, Seq("n"), "left_anti")
        .select(col("n").as("node"), col("n").as("scc_id"))
      so.write.mode("overwrite").parquet(s"$root/selfonly")
      spark.read.parquet(s"$root/selfonly")
    }
    if (remaining.isEmpty) // no non-self edges ⇒ only self-loop singletons
      return selfOnly
    var acc: DataFrame = null
    var round = 1
    while (round <= maxRounds) {
      val fwd = minLabel(remaining, live, s"$root/fwd=$round", maxInner = 64)
      val bwd = minLabel(remaining,
        live.select(col("v").as("u"), col("u").as("v")),
        s"$root/bwd=$round", maxInner = 64)
      val settledNow = fwd.join(bwd.withColumnRenamed("lbl", "blbl"), Seq("n"))
        .filter(col("lbl") === col("blbl"))
        .select(col("n").as("node"), col("lbl").as("scc_id"))
      acc = accChain.stage(
        if (acc == null) settledNow else acc.unionByName(settledNow),
        s"$root/acc=$round")
      remaining = nodeChain.stage(
        remaining.join(acc.select(col("node").as("n")), Seq("n"), "left_anti"),
        s"$root/nodes=$round")
      if (remaining.isEmpty) return acc.unionByName(selfOnly)
      live = edgeChain.stage(
        live.join(remaining.select(col("n").as("u")), Seq("u"), "left_semi")
          .join(remaining.select(col("n").as("v")), Seq("v"), "left_semi"),
        s"$root/edges=$round")
      round += 1
    }
    throw new IllegalStateException(
      s"SCC did not settle every node in $maxRounds rounds — " +
        "settle-chain deeper than the caller's bound")
  }
}
