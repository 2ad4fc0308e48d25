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
  * Scale shape: every inner propagation round is one equi-join per
  * direction (edges ⋈ labels, hash-partitioned — never a nested loop)
  * plus a partial-aggregated min, with BOTH directions fused into one
  * staged round table; labels stage to parquet between rounds so
  * round r never re-executes rounds 1..r−1's lineage (the LabelProp /
  * PageRank discipline). Labels are monotone non-increasing, so
  * convergence is a one-row sum comparison per round. Outer rounds are
  * bounded by the settle-chain depth (≤ #SCCs, usually far less since
  * every locally-minimal component settles in parallel); callers pass
  * graphs whose depth they can bound and `maxRounds` fails loudly
  * rather than spinning.
  */
object Scc {

  /** (n, lbl, blbl): min id reachable FORWARD along `edges` (u→v ⇒ u
    * sees v's label) and BACKWARD (v sees u's) from each node of
    * `nodes`, both directions to fixpoint in the SAME round loop — one
    * staged label table and one convergence probe per round instead of
    * two independent fixpoints. The per-round fixed cost (stage write,
    * lineage-truncating read-back, one-row sum fold) dominates the
    * tiny per-round data at moderate diameters, and the joint loop
    * runs max(depth_fwd, depth_bwd) rounds rather than their sum, so
    * fusing halves the round I/O without touching the Θ(E)-per-round
    * join shape either direction had alone. */
  private def minLabels(
      nodes: DataFrame, edges: DataFrame, stage: String, maxInner: Int): DataFrame = {
    val spark = nodes.sparkSession
    val chain = new graft.Scratch.RoundChain(spark)
    // convergence probe rides the staged-write job itself (Observation
    // over the write action) — a separate read-back-and-sum job per
    // round would double the round count's fixed job cost
    def stageObserved(df: DataFrame, path: String): (DataFrame, (Long, Long)) = {
      val obs = org.apache.spark.sql.Observation()
      val staged = chain.stage(
        df.observe(obs, sum(col("lbl")).as("sf"), sum(col("blbl")).as("sb")),
        path)
      val m = obs.get
      (staged, (m("sf").asInstanceOf[Long], m("sb").asInstanceOf[Long]))
    }
    var (lab, prev) = stageObserved(
      nodes.select(col("n"), col("n").as("lbl"), col("n").as("blbl")),
      s"$stage/round=0")
    var r = 1
    while (r <= maxInner) {
      val viaF = edges
        .join(lab.select(col("n").as("v"), col("lbl").as("nl")), Seq("v"))
        .groupBy(col("u").as("n")).agg(min(col("nl")).as("candF"))
      val viaB = edges
        .join(lab.select(col("n").as("u"), col("blbl").as("bl")), Seq("u"))
        .groupBy(col("v").as("n")).agg(min(col("bl")).as("candB"))
      val nxt = lab
        .join(viaF, Seq("n"), "left_outer")
        .join(viaB, Seq("n"), "left_outer")
        .select(col("n"),
          least(col("lbl"), coalesce(col("candF"), col("lbl"))).as("lbl"),
          least(col("blbl"), coalesce(col("candB"), col("blbl"))).as("blbl"))
      // POINTER JUMP through the PREVIOUS staged round (path halving,
      // directed-sound): lbl(u) is by invariant a node u REACHES, so
      // anything THAT node reaches, u reaches too — folding lab's
      // label of lbl(u) in (and symmetrically lab's back-label of
      // blbl(u), a node that reaches u) is monotone, stays inside the
      // reachable/reaching set, and roughly doubles the propagation
      // horizon per round: the fixpoint (min over the full set, the
      // value the oracle checks) is unchanged while round counts drop
      // from diameter toward its logarithm. Joining against `lab` —
      // a staged parquet scan — rather than `nxt` keeps the round at
      // ONE job with no subtree recomputation.
      val jumped = nxt
        .join(lab.select(col("n").as("lbl"), col("lbl").as("jf")),
          Seq("lbl"), "left_outer")
        .join(lab.select(col("n").as("blbl"), col("blbl").as("jb")),
          Seq("blbl"), "left_outer")
        .select(col("n"),
          least(col("lbl"), coalesce(col("jf"), col("lbl"))).as("lbl"),
          least(col("blbl"), coalesce(col("jb"), col("blbl"))).as("blbl"))
      val (lab2, s) = stageObserved(jumped, s"$stage/round=$r")
      lab = lab2
      if (s == prev) return lab // both monotone ⇒ equal sums ⇒ fixpoint
      prev = s; r += 1
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
    // result directly instead of silently dropping out. Derived from
    // the SELF-LOOP edges alone (u = v ⇒ one leg suffices — no second
    // full edges0 scan) minus the live node set; a count Observation
    // rides the write so the common zero-singleton case skips the
    // result union entirely. Staged PLAINLY (not through a chain): the
    // result frame reads it after every round table has been
    // superseded and reaped.
    val (selfOnly, nSelfOnly) = {
      val obs = org.apache.spark.sql.Observation()
      edges0.filter(col("u") === col("v"))
        .select(col("u").as("n")).distinct()
        .join(remaining, Seq("n"), "left_anti")
        .select(col("n").as("node"), col("n").as("scc_id"))
        .observe(obs, count(lit(1)).as("c"))
        .write.mode("overwrite").parquet(s"$root/selfonly")
      (spark.read.parquet(s"$root/selfonly"), obs.get("c").asInstanceOf[Long])
    }
    def withSelfOnly(df: DataFrame): DataFrame =
      if (nSelfOnly == 0L) df else df.unionByName(selfOnly)
    if (remaining.isEmpty) // no non-self edges ⇒ only self-loop singletons
      return selfOnly
    var acc: DataFrame = null
    var round = 1
    while (round <= maxRounds) {
      val labels = minLabels(remaining, live, s"$root/lbl=$round", maxInner = 64)
      val settledNow = labels
        .filter(col("lbl") === col("blbl"))
        .select(col("n").as("node"), col("lbl").as("scc_id"))
      acc = accChain.stage(
        if (acc == null) settledNow else acc.unionByName(settledNow),
        s"$root/acc=$round")
      // the emptiness probe rides the staged write (Observation), not
      // a separate read-back count job
      val obsN = org.apache.spark.sql.Observation()
      remaining = nodeChain.stage(
        remaining.join(acc.select(col("node").as("n")), Seq("n"), "left_anti")
          .observe(obsN, count(lit(1)).as("c")),
        s"$root/nodes=$round")
      if (obsN.get("c").asInstanceOf[Long] == 0L)
        return withSelfOnly(acc)
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
