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
  * lineage, and `restageEvery` guards label-lineage depth for
  * high-diameter graphs by round-tripping labels through `stagePath`.
  */
object Components {

  /** (id, cluster_id) for every node appearing in `edges0` (a, b);
    * cluster_id = the component's minimum node id. */
  def connectedComponents(
      edges0: DataFrame,
      maxIters: Int = 50,
      restageEvery: Int = 10,
      stagePath: Option[String] = None): DataFrame = {
    val spark = edges0.sparkSession
    val edges = edges0.select(col("a"), col("b"))
      .unionByName(edges0.select(col("b").as("a"), col("a").as("b")))
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("b"), col("lbl")), Seq("b"))
        .groupBy(col("a")).agg(min(col("lbl")).as("nlbl"))
      val next = labels
        .join(nbrMin.select(col("a").as("id"), col("nlbl")), Seq("id"), "left_outer")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val changed = next.select(col("id"), col("lbl").as("nl"))
        .join(labels, Seq("id"))
        .filter(col("nl") =!= col("lbl")).count()
      labels = next
      iter += 1
      converged = changed == 0
      if (!converged && iter % restageEvery == 0) stagePath.foreach { p =>
        val dir = s"$p/labels-$iter"
        labels.write.mode("overwrite").parquet(dir)
        labels = spark.read.parquet(dir) // flat lineage for the next rounds
      }
    }
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }
}
