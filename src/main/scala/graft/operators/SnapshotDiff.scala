package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the change-data-capture primitive for
  * parquet-snapshot pipelines like the reference's: given two table
  * snapshots, emit each key that was added, removed, or changed
  * (unchanged rows are filtered out, which is what keeps the output
  * delta-sized).
  *
  * Scale design: one full outer join, co-partitioned on the key — the
  * minimum data movement any diff can do. The change predicate is a
  * null-safe struct comparison over the non-key columns, evaluated
  * inside the join's generated code; nothing is collected or exploded.
  */
object SnapshotDiff {

  /** (key..., change_type) for every key whose row differs between the
    * snapshots. Both frames must share the schema; non-key columns are
    * compared null-safely. */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val attrs = a.columns.filterNot(keys.contains).toSeq
    val al = a.select(
      struct(keys.map(col): _*).as("__k"), struct(attrs.map(col): _*).as("__va"))
    val bl = b.select(
      struct(keys.map(col): _*).as("__k"), struct(attrs.map(col): _*).as("__vb"))
    al.join(bl, Seq("__k"), "full_outer")
      .withColumn("change_type",
        when(col("__va").isNull, lit("added"))
          .when(col("__vb").isNull, lit("removed"))
          .when(not(col("__va") <=> col("__vb")), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(k => col(s"__k.$k").as(k)) :+ col("change_type"): _*)
  }
}
