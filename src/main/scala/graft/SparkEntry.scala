package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registered query is a QueryDef: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables. Query
  * names are keyed to SURVEY.md §2's operator inventory (aNN analytics
  * surface, jN/pN/kN reference operator semantics, dN dedup, tN text,
  * vN vector/similarity, eN events/streaming-equivalent).
  */
object SparkEntry {

  /** Registry of all declared queries, in registration order. */
  def registry: Seq[QueryDef] =
    CoreAnalytics.all ++ EtlOps.all ++ TextDedup.all ++ Similarity.all ++ Events.all ++ Extras.all ++ TpchShapes.all ++ Media.all ++ TrainPrep.all ++ Clustering.all ++ Sketches.all ++ Graphs.all ++ Quality.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreAnalytics.a3NationRevenue.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
