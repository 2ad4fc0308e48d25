package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous semi-supervised label propagation over an explicit edge
  * list: seed nodes carry fixed labels; each round, every still-
  * unlabeled node adopts the majority label among its already-labeled
  * neighbors (ties broken deterministically: higher count, then
  * smallest label). Labels are clamped once assigned, so the spread is
  * monotone, replay-stable, and expressible round-by-round in plain
  * SQL — which is what puts an iterative graph algorithm under the
  * same DuckDB hash gate as everything else (g3).
  *
  * Scale design: one round = one equi-join (edges ⋈ labels on dst —
  * hash-partitioned by dst, never a nested loop) plus two partial-
  * aggregated hash aggregates ((node, label) counts, then a
  * min(struct(-count, label)) argmin per node — no window, no sort
  * shuffle). The label table is staged to parquet between rounds so
  * round r's plan never re-executes rounds 1..r-1's lineage (the
  * kmeansAssign / connectedComponentsJump discipline); `stagePath`
  * must be cluster-visible on a multi-node cluster — the local temp
  * default only works in local mode.
  */
object LabelProp {

  /** @param edges directed edges (src, dst) — pass both directions for
    *              an undirected graph
    * @param seeds (id, label) fixed seed assignments
    * @param rounds synchronous propagation rounds
    * @return (id, label) for every node labeled within `rounds` */
  def propagate(
      edges: DataFrame,
      seeds: DataFrame,
      rounds: Int,
      stagePath: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    val stage = stagePath.getOrElse(
      graft.Scratch.dir("labelprop-rounds"))
    var lab = seeds.select(col("id"), col("label"))
    // window 1: each staged round supersedes the previous (eagerly freed)
    val chain = new graft.Scratch.RoundChain(spark)
    for (r <- 1 to rounds) {
      val nbr = edges.join(lab.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("c"))
      val maj = nbr.groupBy(col("src"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("b"))
        .select(col("src").as("id"), col("b.l").as("label"))
      val next = lab.unionByName(
        maj.join(lab.select(col("id")), Seq("id"), "left_anti"))
      lab = chain.stage(next, s"$stage/round=$r")
    }
    lab
  }
}
