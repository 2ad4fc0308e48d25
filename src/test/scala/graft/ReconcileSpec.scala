package graft

import graft.operators.Reconcile

/** Row-level reconciliation verdicts: every class, null-safe compare,
  * composite keys. */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("all four classes with drifted-column attribution") {
    val src = Seq(
      (1L, Some(10.0), "A"), // match
      (2L, Some(20.0), "B"), // price drift
      (3L, Some(30.0), "C"), // both drift
      (4L, Some(40.0), "D"), // missing in target
      (5L, None, "E")        // null in source, value in target → MISMATCH
    ).toDF("k", "price", "status")
    val tgt = Seq(
      (1L, Some(10.0), "A"),
      (2L, Some(21.0), "B"),
      (3L, Some(31.0), "X"),
      (5L, Some(5.5), "E"),
      (9L, Some(99.0), "Z")  // extra in target
    ).toDF("k", "price", "status")
    val got = Reconcile.compare(src, tgt, Seq("k"), Seq("price", "status"))
      .as[(Long, String, String)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === Map(
      1L -> (("MATCH", "")),
      2L -> (("MISMATCH", "price")),
      3L -> (("MISMATCH", "price,status")),
      4L -> (("MISSING_IN_TARGET", "")),
      5L -> (("MISMATCH", "price")),
      9L -> (("EXTRA_IN_TARGET", ""))))
    // both-null compares equal under <=>
    val nn = Reconcile.compare(
        Seq((7L, Option.empty[Double])).toDF("k", "price"),
        Seq((7L, Option.empty[Double])).toDF("k", "price"),
        Seq("k"), Seq("price"))
      .as[(Long, String, String)].head()
    assert(nn === ((7L, "MATCH", "")))
  }

  test("composite keys join on all parts") {
    val src = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val tgt = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k1", "k2", "v")
    val got = Reconcile.compare(src, tgt, Seq("k1", "k2"), Seq("v"))
      .as[(Long, String, String, String)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got === Map(
      (1L, "x") -> "MATCH",
      (1L, "y") -> "MISSING_IN_TARGET",
      (2L, "y") -> "EXTRA_IN_TARGET"))
  }

  test("schemaDiff classifies added/removed/retyped/unchanged from footers") {
    val root = java.nio.file.Files.createTempDirectory("sdiff").toString
    Seq((1L, "a", 1.5)).toDF("k", "s", "v").write.parquet(s"$root/a")
    Seq((1L, 2, true)).toDF("k", "v", "flag")
      .withColumn("k", org.apache.spark.sql.functions.col("k").cast("long"))
      .write.parquet(s"$root/b")
    val got = Reconcile.schemaDiff(spark, s"$root/a", s"$root/b")
      .as[(String, String, Option[String], Option[String])].collect().toSet
    assert(got === Set(
      ("flag", "added", None, Some("boolean")),
      ("k", "unchanged", Some("bigint"), Some("bigint")),
      ("s", "removed", Some("string"), None),
      ("v", "retyped", Some("double"), Some("int"))))
  }
}
