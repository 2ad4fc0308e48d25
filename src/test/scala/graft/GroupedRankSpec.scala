package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GroupedRank

/** GroupedRank = the per-group window's answer, computed without the
  * per-group single-task funnel. */
class GroupedRankSpec extends SparkSpec {
  import spark.implicits._

  test("per-group row numbers equal the window oracle, skewed groups included") {
    val rnd = new scala.util.Random(7)
    // group 0 holds ~90% of rows — the straggler shape the operator exists for
    val rows = (1 to 3000).map { i =>
      val g = if (rnd.nextInt(10) == 0) rnd.nextInt(3) + 1 else 0
      (g.toLong, rnd.nextInt(50).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(13) // scrambled input
    val got = GroupedRank.rowNumbers(df, Seq("g"), Seq("v", "id"))
      .select(col("g"), col("id"), col("rn"))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val exp = df.withColumn("rn",
        row_number().over(Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
      .select(col("g"), col("id"), col("rn"))
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3.toLong).toMap
    assert(got.size === rows.size)
    assert(got === exp)
  }

  test("string group keys and multiple group columns") {
    val rows = Seq(
      ("a", 1L, 10L, 1L), ("a", 1L, 5L, 2L), ("a", 2L, 7L, 3L),
      ("b", 1L, 3L, 4L), ("b", 1L, 3L, 5L), ("b", 1L, 1L, 6L))
    val got = GroupedRank.rowNumbers(
        rows.toDF("s", "g", "v", "id"), Seq("s", "g"), Seq("v", "id"))
      .select(col("s"), col("g"), col("id"), col("rn"))
      .as[(String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3) -> t._4).toMap
    assert(got === Map(
      ("a", 1L, 2L) -> 1L, ("a", 1L, 1L) -> 2L, ("a", 2L, 3L) -> 1L,
      ("b", 1L, 6L) -> 1L, ("b", 1L, 4L) -> 2L, ("b", 1L, 5L) -> 3L))
  }
}
