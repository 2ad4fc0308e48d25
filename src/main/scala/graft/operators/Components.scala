package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step that turns near-duplicate PAIRS into dedup groups with one
  * survivor each (A~B and B~C must collapse together even when A~C was
  * never emitted).
  *
  * Algorithm: min-label propagation to fixpoint. Every node starts
  * labeled with itself; each round replaces a node's label with the
  * minimum over its neighborhood; convergence is detected by counting
  * changed labels. Rounds needed = graph diameter (near-dup clusters are
  * shallow — pairs and small chains — so 2-3 rounds in practice; the
  * alternating small-star/large-star variant would cut worst cases to
  * O(log n)). Each round is one join + one aggregate on (id, lbl) pairs
  * — never on the corpus. Callers should pass a *materialized* edge
  * frame (e.g. staged to parquet): iterations re-execute the edge
  * lineage; labels round-trip through staged parquet every round, so
  * label lineage stays flat at any diameter.
  */
object Components {

  /** (id, cluster_id) for every node appearing in `edges0` (a, b);
    * cluster_id = the component's minimum node id. */
  def connectedComponents(
      edges0: DataFrame,
      maxIters: Int = 50,
      stagePath: Option[String] = None): DataFrame = {
    val spark = edges0.sparkSession
    val stage = stagePath.getOrElse(graft.Scratch.dir(spark, "cc-rounds"))
    val edges = edges0.select(col("a"), col("b"))
      .unionByName(edges0.select(col("b").as("a"), col("a").as("b")))
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    var converged = false
    var iter = 0
    // labels are MONOTONE non-increasing (least() per node), so an
    // unchanged label SUM is the fixpoint — and the sum rides the
    // staged write itself (Observation over the write action, Scc's
    // probe discipline): ONE job per round, lineage flat every round.
    // The old shape ran a separate read-back aggregate per round that
    // re-executed the whole unstaged label lineage since the last
    // restage — at local[32]'s ~110 ms fixed job cost the probe job,
    // not the label data, dominated every shallow-graph round.
    var prevSum: Option[Long] = None
    // window 1: each staged round supersedes the previous (eagerly freed)
    val chain = new graft.Scratch.RoundChain(spark)
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("b"), col("lbl")), Seq("b"))
        .groupBy(col("a")).agg(min(col("lbl")).as("nlbl"))
      val next = labels
        .join(nbrMin.select(col("a").as("id"), col("nlbl")), Seq("id"), "left_outer")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val obs = org.apache.spark.sql.Observation()
      labels = chain.stage(
        next.observe(obs, sum(col("lbl")).as("s")), s"$stage/labels-${iter + 1}")
      val sAny = obs.get("s")
      val s = if (sAny == null) 0L else sAny.asInstanceOf[Long] // empty = fixpoint
      iter += 1
      converged = prevSum.contains(s) || sAny == null
      prevSum = Some(s)
    }
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Connected components with POINTER JUMPING — the O(log diameter)
    * variant for adversarially deep graphs (long chains, filament
    * clusters), where the plain propagation above needs diameter
    * rounds. Each round does the neighbor-min step and then shortcuts
    * every label to its label's label (`lbl ← min(lbl, lbl(lbl))`, the
    * classic path-halving trick): the distance from any node to its
    * component minimum at least halves per round. Labels only ever
    * decrease and never leave the component, so the fixed point is the
    * per-component minimum — identical output to
    * [[connectedComponents]]. Labels stage to parquet every round
    * (label frames are edge-node-sized, tiny next to a corpus), keeping
    * every round's lineage flat. */
  def connectedComponentsJump(
      edges0: DataFrame,
      stagePath: String,
      maxIters: Int = 40): DataFrame = {
    val spark = edges0.sparkSession
    def stage(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$stagePath/$name")
      spark.read.parquet(s"$stagePath/$name")
    }
    val edges = stage(
      edges0.select(col("a"), col("b"))
        .unionByName(edges0.select(col("b").as("a"), col("a").as("b"))), "edges")
    // window 1: each staged round supersedes the previous; the staged
    // `edges` frame is NOT on the chain (referenced every round). The
    // convergence probe (labels monotone ⇒ unchanged sum = fixpoint)
    // rides each round's staged write as an Observation — no separate
    // compare-to-previous join job per round.
    val chain = new graft.Scratch.RoundChain(spark)
    var labels = chain.stage(
      edges.select(col("a").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")), s"$stagePath/labels-0")
    var iter = 0
    var converged = false
    var prevSum: Option[Long] = None
    while (!converged && iter < maxIters) {
      // neighbor-min step (as in connectedComponents)
      val nbrMin = edges
        .join(labels.select(col("id").as("b"), col("lbl")), Seq("b"))
        .groupBy(col("a")).agg(min(col("lbl")).as("nlbl"))
      val prop = labels
        .join(nbrMin.select(col("a").as("id"), col("nlbl")), Seq("id"), "left_outer")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // pointer jump: follow my label's label (label rows double as the
      // lookup table — a label IS a node id in the same frame)
      val next = prop.as("x")
        .join(prop.select(col("id").as("lbl"), col("lbl").as("ll")).as("y"),
          Seq("lbl"), "left_outer")
        .select(col("id"), least(col("lbl"), coalesce(col("ll"), col("lbl"))).as("lbl"))
      val obs = org.apache.spark.sql.Observation()
      labels = chain.stage(
        next.observe(obs, sum(col("lbl")).as("s")), s"$stagePath/labels-${iter + 1}")
      val sAny = obs.get("s")
      val s = if (sAny == null) 0L else sAny.asInstanceOf[Long] // empty = fixpoint
      converged = prevSum.contains(s) || sAny == null
      prevSum = Some(s)
      iter += 1
    }
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }
}
