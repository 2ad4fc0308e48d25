package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over a directed edge list — iterative graph
  * centrality as pure DataFrame algebra.
  *
  * Scale design: each round is ONE equi-join of the edge list with the
  * (node-sized) rank table plus one partial-aggregated shuffle on dst —
  * the rank and degree tables are broadcast-or-shuffle joined by
  * Catalyst as their size dictates, nothing is ever collected, and hot
  * destination nodes are ordinary AQE skew territory. Rank lineage
  * deepens by one join per round, so long runs stage through
  * `stagePath` (the kmeans/CC recipe).
  *
  * Determinism: ranks live in exact scaled-integer space (`scale`
  * micro-units). Every step is integer multiply + truncating division
  * on non-negative values, so iteration order, partitioning, and engine
  * cannot perturb a single unit — a SQL oracle reproduces the ranks
  * bit-for-bit (g1's gate). Bound: `r * w` must fit in a BIGINT —
  * r <= scale, so per-edge weights must stay below 2^63/scale (9.2e6 at
  * the default scale; pre-normalize heavier weights or lower `scale`).
  *
  * Dangling nodes (no out-edges) keep receiving the teleport share but
  * redistribute nothing — the standard simplification; total mass then
  * decays slightly, which is irrelevant for ranking.
  */
object PageRank {

  /** One power-iteration round: contribs gathered on dst, teleport added
    * uniformly. Shared by the fixed-round and converged entry points. */
  private def step(
      edges: DataFrame, nodes: DataFrame, outw: DataFrame, nTot: DataFrame,
      r: DataFrame, scale: Long): DataFrame = {
    val contrib = edges
      .join(outw, Seq("src"))
      .join(r.select(col("id").as("src"), col("r")), Seq("src"))
      .select(col("dst"), expr("(r * w) div wout").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("s"))
    nodes
      .join(contrib.select(col("dst").as("id"), col("s")), Seq("id"), "left_outer")
      .crossJoin(broadcast(nTot))
      .select(col("id"), expr(
        s"((15 * $scale) div 100) div n_nodes + (85 * coalesce(s, 0)) div 100").as("r"))
  }

  /** (id, r) after `iters` rounds, r in `scale` micro-units.
    * `edges` columns: src, dst, w (positive integer weight). */
  def ranks(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      stagePath: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
    val nTot = nodes.agg(count(lit(1)).as("n_nodes"))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    var r = nodes.crossJoin(broadcast(nTot))
      .select(col("id"), expr(s"$scale div n_nodes").as("r"))
    // window 1: each staged round supersedes the previous (eagerly freed)
    val chain = new graft.Scratch.RoundChain(spark)
    for (i <- 1 to iters) {
      r = step(edges, nodes, outw, nTot, r, scale)
      stagePath.foreach { p => r = chain.stage(r, s"$p/rank-$i") }
    }
    r
  }

  /** CONVERGENCE mode: iterate until the largest per-node rank change is
    * <= `toleranceUnits` (in `scale` micro-units) or `maxRounds` is
    * spent, whichever first. Returns (ranks, roundsRun).
    *
    * This is the 100 TB contract the fixed-round gated queries can't
    * honor: at 100× the graph the fixed point moves, and the right
    * budget isn't knowable up front. Every round stages the node-sized
    * rank table to parquet (mandatory here — the delta probe reads the
    * staged rounds, and lineage stays flat however long convergence
    * takes), then ONE extra node-sized join + 1-row max aggregate probes
    * the delta — cost O(nodes), trivial next to the edge⋈rank join.
    * The ranks are exact integers, so the probe is deterministic: the
    * same graph converges in the same number of rounds on any cluster
    * layout. `stagePath` must be cluster-visible on a real cluster
    * (same contract as the kmeans/Components staging). */
  def ranksConverged(
      edges: DataFrame,
      maxRounds: Int,
      toleranceUnits: Long,
      scale: Long = 1000000000000L,
      stagePath: Option[String] = None): (DataFrame, Int) = {
    val spark = edges.sparkSession
    val stage = stagePath.getOrElse(
      graft.Scratch.dir("pagerank-rounds"))
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
    val nTot = nodes.agg(count(lit(1)).as("n_nodes"))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    var r = nodes.crossJoin(broadcast(nTot))
      .select(col("id"), expr(s"$scale div n_nodes").as("r"))
    var rounds = 0
    var delta = Long.MaxValue
    // window 2: the delta probe reads round r−1 after round r lands
    val chain = new graft.Scratch.RoundChain(spark, window = 2)
    while (rounds < maxRounds && delta > toleranceUnits) {
      val prev = r
      r = chain.stage(
        step(edges, nodes, outw, nTot, prev, scale), s"$stage/rank-${rounds + 1}")
      // the probe: one node-sized equi-join, 1-row max to the driver
      delta = r.join(prev.select(col("id"), col("r").as("__p")), Seq("id"))
        .agg(coalesce(max(abs(col("r") - col("__p"))), lit(0L)).as("d"))
        .collect()(0).getLong(0)
      rounds += 1
    }
    (r, rounds)
  }

  /** PERSONALIZED PageRank: the teleport mass lands only on `seeds`
    * (col `id`) instead of uniformly — proximity-to-seed-set scoring,
    * the recommendation/expansion primitive ("parts related to THESE
    * parts"). Same exact scaled-integer discipline as [[ranks]]: seed
    * teleport = (15%·scale)/|S| per seed per round, zero elsewhere, so
    * an unrolled SQL oracle reproduces every unit ([[sqlPersonalized]]).
    * Same per-round cost shape too — one edge⋈rank join + one dst
    * shuffle; the seed table is node-sized-or-smaller and joins by id. */
  def personalizedRanks(
      edges: DataFrame,
      seeds: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      stagePath: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
    val st = seeds.select(col("id")).distinct().agg(count(lit(1)).as("n_seeds"))
    val seedFlag = seeds.select(col("id")).distinct().withColumn("__seed", lit(1))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    var r = nodes.join(seedFlag, Seq("id"), "left_outer")
      .crossJoin(broadcast(st))
      .select(col("id"),
        expr(s"CASE WHEN __seed IS NOT NULL THEN $scale div n_seeds ELSE CAST(0 AS BIGINT) END").as("r"))
    // window 1: each staged round supersedes the previous (eagerly freed)
    val ppChain = new graft.Scratch.RoundChain(spark)
    for (i <- 1 to iters) {
      val contrib = edges
        .join(outw, Seq("src"))
        .join(r.select(col("id").as("src"), col("r")), Seq("src"))
        .select(col("dst"), expr("(r * w) div wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      r = nodes
        .join(contrib.select(col("dst").as("id"), col("s")), Seq("id"), "left_outer")
        .join(seedFlag, Seq("id"), "left_outer")
        .crossJoin(broadcast(st))
        .select(col("id"), expr(
          s"""CASE WHEN __seed IS NOT NULL THEN ((15 * $scale) div 100) div n_seeds
             |ELSE CAST(0 AS BIGINT) END + (85 * coalesce(s, 0)) div 100""".stripMargin).as("r"))
      stagePath.foreach { p => r = ppChain.stage(r, s"$p/pprank-$i") }
    }
    r
  }

  /** [[personalizedRanks]] as unrolled SQL CTEs: emits `e` (from
    * `edgesCte`), nodes/ow, `seeds` (from `seedsCte`, one `id` column),
    * st, then c1/r1 … The final rank table is `r$iters` (id, r). */
  def sqlPersonalized(
      edgesCte: String, seedsCte: String, iters: Int,
      scale: Long = 1000000000000L): String = {
    val header =
      s"""e AS ($edgesCte),
         |nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e) u),
         |ow AS (SELECT src, sum(w) AS wout FROM e GROUP BY src),
         |seeds AS (SELECT DISTINCT id FROM ($seedsCte) z),
         |st AS (SELECT count(*) AS n_seeds FROM seeds),
         |r0 AS (SELECT n.id,
         |    CASE WHEN s.id IS NOT NULL THEN $scale // st.n_seeds ELSE 0 END AS r
         |  FROM nodes n LEFT JOIN seeds s USING (id), st)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst, CAST(sum((p.r * e.w) // ow.wout) AS BIGINT) AS s
         |  FROM e JOIN ow USING (src) JOIN r${i - 1} p ON p.id = e.src GROUP BY e.dst),
         |r$i AS (SELECT n.id,
         |    CASE WHEN s.id IS NOT NULL THEN ((15 * $scale) // 100) // st.n_seeds ELSE 0 END
         |      + (85 * coalesce(c$i.s, 0)) // 100 AS r
         |  FROM nodes n LEFT JOIN seeds s USING (id) LEFT JOIN c$i ON c$i.dst = n.id, st)""".stripMargin
    }
    (header +: rounds).mkString(",\n")
  }

  /** The same computation as unrolled ANSI SQL CTEs (DuckDB oracle):
    * emits `e` (from `edgesCte`), nodes/nt/ow, then c1/r1 … c$iters/
    * r$iters. The final rank table is `r$iters` (id, r). */
  def sqlRanks(edgesCte: String, iters: Int, scale: Long = 1000000000000L): String =
    sqlRanksPrefixed(edgesCte, iters, scale, prefix = "", init = None)

  /** [[sqlRanks]] with namespaced CTEs (`<prefix>e`, `<prefix>r<i>`, …)
    * so one oracle can unroll SEVERAL rank computations (g22's
    * old-graph / warm-started / cold chains), and an optional custom
    * `init` SQL for `<prefix>r0` — it may reference `<prefix>nodes` /
    * `<prefix>nt` and any earlier prefix's CTEs (warm starts). */
  def sqlRanksPrefixed(
      edgesCte: String,
      iters: Int,
      scale: Long = 1000000000000L,
      prefix: String = "",
      init: Option[String] = None): String = {
    val p = prefix
    val r0 = init.getOrElse(
      s"SELECT id, $scale // n_nodes AS r FROM ${p}nodes, ${p}nt")
    val header =
      s"""${p}e AS ($edgesCte),
         |${p}nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM ${p}e UNION ALL SELECT dst FROM ${p}e) u),
         |${p}nt AS (SELECT count(*) AS n_nodes FROM ${p}nodes),
         |${p}ow AS (SELECT src, sum(w) AS wout FROM ${p}e GROUP BY src),
         |${p}r0 AS ($r0)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${p}c$i AS (SELECT ${p}e.dst, CAST(sum((p.r * ${p}e.w) // ${p}ow.wout) AS BIGINT) AS s
         |  FROM ${p}e JOIN ${p}ow USING (src) JOIN ${p}r${i - 1} p ON p.id = ${p}e.src GROUP BY ${p}e.dst),
         |${p}r$i AS (SELECT n.id,
         |    ((15 * $scale) // 100) // ${p}nt.n_nodes + (85 * coalesce(${p}c$i.s, 0)) // 100 AS r
         |  FROM ${p}nodes n LEFT JOIN ${p}c$i ON ${p}c$i.dst = n.id, ${p}nt)""".stripMargin
    }
    (header +: rounds).mkString(",\n")
  }

  /** WARM-START ranks: like [[ranks]] but round 0 is `init` (id, r) —
    * nodes absent from `init` (new nodes after a graph change) start at
    * the uniform share. The incremental-maintenance primitive: after a
    * delta of edges lands, a couple of warm rounds from the previous
    * fixed point replace a full cold recompute (g22's gate runs both
    * and reports the agreement delta). Same exact-integer determinism
    * as [[ranks]]. */
  def ranksFrom(
      edges: DataFrame,
      init: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      stagePath: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
    val nTot = nodes.agg(count(lit(1)).as("n_nodes"))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    var r = nodes
      .join(init.select(col("id"), col("r").as("__init")), Seq("id"), "left_outer")
      .crossJoin(broadcast(nTot))
      .select(col("id"),
        coalesce(col("__init"), expr(s"$scale div n_nodes")).as("r"))
    val chain = new graft.Scratch.RoundChain(spark)
    for (i <- 1 to iters) {
      r = step(edges, nodes, outw, nTot, r, scale)
      stagePath.foreach { p => r = chain.stage(r, s"$p/rank-$i") }
    }
    r
  }
}
