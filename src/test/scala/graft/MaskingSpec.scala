package graft

import org.apache.spark.sql.functions._
import graft.operators.Masking

/** Masking policies: deterministic pseudonymization, redaction, and
  * EXACT numeric generalization (no double round-trip, floor semantics
  * across the sign boundary). */
class MaskingSpec extends SparkSpec {
  import spark.implicits._

  test("generalizeNumeric floors across the sign boundary in exact arithmetic") {
    val df = Seq(-105L, -100L, -1L, 0L, 1L, 99L, 100L, 105L).toDF("v")
    val got = df.select(Masking.generalizeNumeric(col("v"), 100L).as("b"))
      .as[Long].collect().toSeq
    assert(got === Seq(-200L, -100L, -100L, 0L, 0L, 0L, 100L, 100L),
      "negatives bucket BELOW zero (floor), not toward it (truncate)")
  }

  test("values beyond 2^53 land in the right bucket (the double-precision failure class)") {
    // 2^53 + 1 is not representable as a double: the old
    // floor(cast-double/step) path rounds it to 2^53 and buckets wrong
    val v = (1L << 53) + 1L
    val step = 2L
    val got = Seq(v).toDF("v")
      .select(Masking.generalizeNumeric(col("v"), step).as("b"))
      .as[Long].collect().head
    assert(got === v - 1L, s"expected exact bucket ${v - 1}, got $got")
  }

  test("decimal columns generalize exactly in their own arithmetic") {
    val got = Seq("-0.01", "0.00", "99.99", "100.00", "12345678901.23")
      .toDF("s")
      .select(Masking.generalizeNumeric(col("s").cast("decimal(13,2)"), 100L).as("b"))
      .as[Long].collect().toSeq
    assert(got === Seq(-100L, 0L, 0L, 100L, 12345678900L))
  }

  test("mask applies per-column policies and passes the rest through") {
    val df = Seq((1L, "alice", 123.45)).toDF("id", "name", "bal")
    val out = Masking.mask(df, Map(
      "name" -> Masking.hash,
      "bal" -> (_ => Masking.redact)))
    val r = out.collect().head
    assert(r.getLong(0) === 1L)
    assert(r.getString(1).length === 64 && r.getString(1) != "alice")
    assert(r.getString(2) === "REDACTED")
  }
}
