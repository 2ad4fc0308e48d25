package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables => T}
import graft.operators.PageRank

/** Graph analytics over fixture-derived graphs (operators.PageRank,
  * operators.Components). */
object Graphs {

  // --- g1_pagerank: weighted PageRank over the event-type transition
  // graph (e9's edges: consecutive events per user, weight = transition
  // count), 3 rounds. Ranks are exact scaled integers, so the unrolled
  // SQL oracle matches bit-for-bit — iterative graph centrality under
  // the same hash gate as everything else. ---
  val g1Pagerank = QueryDef.sql(
    "g1_pagerank",
    s"""WITH seq AS (SELECT event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
       |  FROM events),
       |${PageRank.sqlRanks(
            "SELECT src, dst, count(*) AS w FROM seq WHERE dst IS NOT NULL GROUP BY src, dst",
            iters = 3)}
       |SELECT id AS event_type, r AS rank_scaled,
       |  CAST(r AS DOUBLE) / CAST(1000000000000 AS DOUBLE) AS pr
       |FROM r3""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = T.events(s, d)
      .select(col("event_type").as("src"), lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    PageRank.ranks(edges, iters = 3)
      .select(col("id").as("event_type"), col("r").as("rank_scaled"),
        expr("CAST(r AS DOUBLE) / CAST(1000000000000 AS DOUBLE)").as("pr"))
  }

  val all: Seq[QueryDef] = Seq(g1Pagerank)
}
