package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{DamerauLevenshtein, JaroWinkler, StringDistances}

/** Pins the string-distance kernels to DuckDB's observed semantics.
  * Every vector below was probed against DuckDB's
  * jaro_similarity / jaro_winkler_similarity / damerau_levenshtein —
  * these are the exact values the d13 oracle gate will recompute. */
class StringDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  // (a, b, jaro, jaro_winkler, damerau) — DuckDB-probed
  private val vectors = Seq(
    ("martha", "marhta", 0.9444444444444445, 0.9611111111111111, 1),
    ("dwayne", "duane", 0.8222222222222223, 0.8400000000000001, 2),
    ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332, 4),
    ("", "abc", 0.0, 0.0, 3),
    ("", "", 0.0, 0.0, 0),
    ("abc", "abc", 1.0, 1.0, 0),
    ("a", "b", 0.0, 0.0, 1),
    ("ab", "ba", 0.0, 0.0, 1), // window 0: same-index matches only
    ("CA", "ABC", 0.0, 0.0, 2), // FULL Damerau (OSA would give 3)
    ("jellyfish", "smellyfish", 0.8962962962962964, 0.8962962962962964, 2),
    ("hello world", "hello wrold", 0.9696969696969697, 0.9818181818181818, 1),
    ("abcdefgh", "abzyxwvu", 0.5, 0.5, 6), // jaro <= 0.7: boost NOT applied
    ("ab", "abcdefghijklmnop", 0.7083333333333334, 0.7666666666666667, 14),
    ("abcdxx", "abcdyy", 0.7777777777777777, 0.8666666666666666, 2),
    ("abcdefghij", "abcdefghix", 0.9333333333333332, 0.96, 1), // prefix cap 4
    ("abcdef", "bcadef", 0.9444444444444445, 0.9444444444444445, 2), // t = floor(3/2); no common prefix
    ("abcabc", "cabcab", 0.8333333333333334, 0.8333333333333334, 2),
    ("abcd", "dcba", 0.5, 0.5, 3),
    ("prefixmatch", "prefixnomat", 0.8787878787878789, 0.9272727272727274, 4))

  test("kernels reproduce the DuckDB-probed vectors exactly") {
    vectors.foreach { case (a, b, j, jw, dl) =>
      assert(StringDistances.jaro(u(a), u(b)) === j, s"jaro($a,$b)")
      assert(StringDistances.jaroWinkler(u(a), u(b)) === jw, s"jw($a,$b)")
      assert(StringDistances.damerauLevenshtein(u(a), u(b)) === dl, s"dl($a,$b)")
    }
  }

  test("distances are symmetric and agree through codegen") {
    val df = vectors.map(v => (v._1, v._2)).toDF("a", "b")
      .select(col("a"), col("b"),
        JaroWinkler.of(col("a"), col("b")).as("jw_ab"),
        JaroWinkler.of(col("b"), col("a")).as("jw_ba"),
        DamerauLevenshtein.of(col("a"), col("b")).as("dl_ab"),
        DamerauLevenshtein.of(col("b"), col("a")).as("dl_ba"))
    val rows = df.as[(String, String, Double, Double, Int, Int)].collect()
    assert(rows.length === vectors.length)
    rows.foreach { case (a, b, jwAb, jwBa, dlAb, dlBa) =>
      assert(jwAb === jwBa, s"jw symmetry ($a,$b)")
      assert(dlAb === dlBa, s"dl symmetry ($a,$b)")
      val exp = vectors.find(v => v._1 == a && v._2 == b).get
      assert(jwAb === exp._4, s"codegen jw ($a,$b)") // same value via codegen path
      assert(dlAb === exp._5, s"codegen dl ($a,$b)")
    }
  }

  test("damerau unit-edit and metric sanity on random strings") {
    val rnd = new scala.util.Random(42)
    def word(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 1 to 300) {
      val a = word(1 + rnd.nextInt(8)); val b = word(1 + rnd.nextInt(8))
      val d = StringDistances.damerauLevenshtein(u(a), u(b))
      assert(d >= math.abs(a.length - b.length) && d <= math.max(a.length, b.length),
        s"bounds ($a,$b)=$d")
      assert((d == 0) === (a == b), s"identity ($a,$b)")
      // one adjacent transposition costs at most 1
      if (a.length >= 2) {
        val i = rnd.nextInt(a.length - 1)
        val t = a.substring(0, i) + a(i + 1) + a(i) + a.substring(i + 2)
        assert(StringDistances.damerauLevenshtein(u(a), u(t)) <= 1, s"swap $a->$t")
      }
    }
  }
}
