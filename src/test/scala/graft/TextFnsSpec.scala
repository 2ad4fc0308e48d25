package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Column-function unit coverage: the regex shingle fast path must agree
  * with the HOF formulation on messy whitespace (newlines, tabs, runs of
  * spaces), since the DuckDB oracles tokenize on \s+.
  */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("shinglesRegex == shingles on messy whitespace") {
    val docs = Seq(
      "a b c d e",
      "a\nb\tc  d\r\ne",
      "  leading   and \t trailing\n ",
      "one",
      "two tokens",
      "exactly three toks").toDF("text")
    for (n <- Seq(2, 3)) {
      val rows = docs.select(
        TextFns.shingles(TextFns.tokens(col("text")), n).as("hof"),
        TextFns.shinglesRegex(col("text"), n).as("re"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (hof, re) =>
        assert(re === hof, s"n=$n")
      }
    }
  }

  test("fingerprint is whitespace- and case-insensitive") {
    val fps = Seq("Hello  World", "hello world", "hello\nworld\t")
      .toDF("text").select(TextFns.fingerprint(col("text")))
      .as[String].collect().toSet
    assert(fps.size === 1)
  }
}
