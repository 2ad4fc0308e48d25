package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities) over a weighted directed edge list — the
  * bipartite-flavored centrality PageRank can't express: a node is a
  * good HUB if it points at good authorities, a good AUTHORITY if good
  * hubs point at it (Kleinberg 1999).
  *
  * Scale design mirrors [[PageRank]]: each half-round is ONE equi-join
  * of the edge list against the (node-sized) score table plus one
  * partial-aggregated shuffle on the gathering endpoint; the max used
  * for normalization is a 1-row aggregate broadcast back (q22's
  * pattern, never a global window). Score lineage deepens two joins per
  * round, so long runs stage through `stagePath`.
  *
  * Determinism: classic HITS L2-normalizes each vector — irrational,
  * engine-dependent. Here scores are normalized by the MAX instead, in
  * exact integer arithmetic: x' = x div (max(x) div scale). max() and
  * integer div are order-independent, so a SQL oracle reproduces every
  * unit bit-for-bit (the g1 gate). The divisor form keeps products in
  * range: scores stay <= ~2*scale, so `score * w` needs only
  * 2*scale*maxWeight < 2^63 (w < 4.6e8 at the default scale) and the
  * giant `x * scale` multiply that would overflow BIGINT never happens.
  *
  * OVERFLOW BOUND (the real one): the gathered value is the per-node
  * SUM of score*w over its incident edges, so the binding constraint is
  * on a node's total incident weight, not a single edge:
  * `2*scale * max_node(sum of w in / sum of w out) < 2^63`, i.e. total
  * incident weight per node < ~4.6e9 at the default scale. Exceeding it
  * wraps silently in non-ANSI Spark while DuckDB errors — breaking
  * oracle parity exactly when the result is garbage. Callers with
  * extreme degree×weight graphs should pass `checkBounds = true` (two
  * one-off degree aggregates, failing loudly up front) or lower
  * `scale`.
  */
object Hits {

  /** Fail loudly if a node's total incident weight could overflow the
    * per-node sum(score*w) gather (see the object doc's bound). Two
    * one-off partial-aggregated degree scans; call before iterating. */
  private def assertBounds(edges: DataFrame, scale: Long): Unit = {
    val maxIncident = edges.select(col("dst").as("id"), col("w"))
      .unionByName(edges.select(col("src").as("id"), col("w")))
      .groupBy(col("id")).agg(sum(col("w")).as("tw"))
      .agg(coalesce(max(col("tw")), lit(0L))).collect()(0).getLong(0)
    // scores stay <= ~2*scale after max-normalization
    require(maxIncident <= Long.MaxValue / (2 * scale),
      s"HITS overflow risk: max total incident weight per node " +
        s"($maxIncident) * 2*scale ($scale) exceeds 2^63; lower `scale` " +
        "or pre-normalize edge weights")
  }

  /** (id, hub, auth) after `iters` full rounds, scores in `scale`
    * units (max-normalized each half-round). `edges` columns: src,
    * dst, w (positive integer weight). Nodes with no in-edges get
    * auth 0; no out-edges, hub 0. `checkBounds` runs the loud
    * up-front overflow guard (object doc). */
  def scores(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000L,
      stagePath: Option[String] = None,
      checkBounds: Boolean = false): DataFrame = {
    if (checkBounds) assertBounds(edges, scale)
    val spark = edges.sparkSession
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
    var h = nodes.select(col("id"), lit(scale).as("h"))
    var a = nodes.select(col("id"), lit(0L).as("a"))
    // window 1 per vector: each staged round supersedes the previous.
    // The h round staged at i reads a-i (already durably landed), so
    // freeing a-(i-1)/h-(i-1) when i lands is safe.
    val aChain = new graft.Scratch.RoundChain(spark)
    val hChain = new graft.Scratch.RoundChain(spark)
    for (i <- 1 to iters) {
      val araw = edges
        .join(h.select(col("id").as("src"), col("h")), Seq("src"))
        .select(col("dst"), (col("h") * col("w")).as("x"))
        .groupBy(col("dst")).agg(sum(col("x")).as("x"))
      val amax = araw.agg(max(col("x")).as("mx"))
      a = nodes
        .join(araw.select(col("dst").as("id"), col("x")), Seq("id"), "left_outer")
        .crossJoin(broadcast(amax))
        .select(col("id"),
          coalesce(expr(s"x div (mx div $scale)"), lit(0L)).as("a"))
      val hraw = edges
        .join(a.select(col("id").as("dst"), col("a")), Seq("dst"))
        .select(col("src"), (col("a") * col("w")).as("x"))
        .groupBy(col("src")).agg(sum(col("x")).as("x"))
      val hmax = hraw.agg(max(col("x")).as("mx"))
      h = nodes
        .join(hraw.select(col("src").as("id"), col("x")), Seq("id"), "left_outer")
        .crossJoin(broadcast(hmax))
        .select(col("id"),
          coalesce(expr(s"x div (mx div $scale)"), lit(0L)).as("h"))
      stagePath.foreach { p =>
        a = aChain.stage(a, s"$p/a-$i")
        h = hChain.stage(h, s"$p/h-$i")
      }
    }
    h.join(a, Seq("id"))
  }

  /** CONVERGENCE mode: full HITS rounds until the largest per-node
    * change in EITHER score (hub or authority, in `scale` units) is
    * <= `toleranceUnits`, or `maxRounds` is spent. Returns
    * ((id, hub, auth), roundsRun). Same restaging discipline as
    * [[PageRank.ranksConverged]]: node-sized score tables stage every
    * round (lineage flat for unbounded round counts), and the delta
    * probe is one node-sized join + 1-row max per half-vector — exact
    * integers, so convergence round counts are deterministic. The
    * max-normalization keeps both vectors on the `scale` grid, so a
    * tolerance of k units means "no node's normalized score moved more
    * than k parts in `scale`". */
  def scoresConverged(
      edges: DataFrame,
      maxRounds: Int,
      toleranceUnits: Long,
      scale: Long = 1000000000L,
      stagePath: Option[String] = None): (DataFrame, Int) = {
    val spark = edges.sparkSession
    val stage = stagePath.getOrElse(
      graft.Scratch.dir("hits-rounds"))
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
    var h = nodes.select(col("id"), lit(scale).as("h"))
    var a = nodes.select(col("id"), lit(0L).as("a"))
    var rounds = 0
    var delta = Long.MaxValue
    // window 2: the delta probe reads round i−1 after round i lands
    val aChain = new graft.Scratch.RoundChain(spark, window = 2)
    val hChain = new graft.Scratch.RoundChain(spark, window = 2)
    while (rounds < maxRounds && delta > toleranceUnits) {
      val (hPrev, aPrev) = (h, a)
      val i = rounds + 1
      val araw = edges
        .join(h.select(col("id").as("src"), col("h")), Seq("src"))
        .select(col("dst"), (col("h") * col("w")).as("x"))
        .groupBy(col("dst")).agg(sum(col("x")).as("x"))
      val amax = araw.agg(max(col("x")).as("mx"))
      a = nodes
        .join(araw.select(col("dst").as("id"), col("x")), Seq("id"), "left_outer")
        .crossJoin(broadcast(amax))
        .select(col("id"),
          coalesce(expr(s"x div (mx div $scale)"), lit(0L)).as("a"))
      val hraw = edges
        .join(a.select(col("id").as("dst"), col("a")), Seq("dst"))
        .select(col("src"), (col("a") * col("w")).as("x"))
        .groupBy(col("src")).agg(sum(col("x")).as("x"))
      val hmax = hraw.agg(max(col("x")).as("mx"))
      h = nodes
        .join(hraw.select(col("src").as("id"), col("x")), Seq("id"), "left_outer")
        .crossJoin(broadcast(hmax))
        .select(col("id"),
          coalesce(expr(s"x div (mx div $scale)"), lit(0L)).as("h"))
      a = aChain.stage(a, s"$stage/a-$i")
      h = hChain.stage(h, s"$stage/h-$i")
      delta = h.join(hPrev.select(col("id"), col("h").as("__p")), Seq("id"))
        .agg(coalesce(max(abs(col("h") - col("__p"))), lit(0L)).as("d"))
        .collect()(0).getLong(0)
        .max(a.join(aPrev.select(col("id"), col("a").as("__p")), Seq("id"))
          .agg(coalesce(max(abs(col("a") - col("__p"))), lit(0L)).as("d"))
          .collect()(0).getLong(0))
      rounds += 1
    }
    (h.join(a, Seq("id")), rounds)
  }

  /** The same computation as unrolled ANSI SQL CTEs (DuckDB oracle):
    * emits `e` (from `edgesCte`), `nodes`, `h0`, then
    * ar1/am1/a1/hr1/hm1/h1 … The final tables are `h$iters` (id, h)
    * and `a$iters` (id, a). */
  def sqlScores(edgesCte: String, iters: Int, scale: Long = 1000000000L): String = {
    val header =
      s"""e AS ($edgesCte),
         |nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e) u),
         |h0 AS (SELECT id, CAST($scale AS BIGINT) AS h FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""ar$i AS (SELECT e.dst, CAST(sum(p.h * e.w) AS BIGINT) AS x
         |  FROM e JOIN h${i - 1} p ON p.id = e.src GROUP BY e.dst),
         |am$i AS (SELECT max(x) AS mx FROM ar$i),
         |a$i AS (SELECT n.id, CAST(coalesce(ar$i.x // (am$i.mx // $scale), 0) AS BIGINT) AS a
         |  FROM nodes n LEFT JOIN ar$i ON ar$i.dst = n.id, am$i),
         |hr$i AS (SELECT e.src, CAST(sum(q.a * e.w) AS BIGINT) AS x
         |  FROM e JOIN a$i q ON q.id = e.dst GROUP BY e.src),
         |hm$i AS (SELECT max(x) AS mx FROM hr$i),
         |h$i AS (SELECT n.id, CAST(coalesce(hr$i.x // (hm$i.mx // $scale), 0) AS BIGINT) AS h
         |  FROM nodes n LEFT JOIN hr$i ON hr$i.src = n.id, hm$i)""".stripMargin
    }
    (header +: rounds).mkString(",\n")
  }
}
