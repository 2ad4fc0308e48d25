package graft

import org.apache.spark.sql.functions._
import graft.operators.Pprl

/** CLK Bloom-encoded privacy-preserving linkage: encodings carry no
  * plaintext, typos degrade Dice instead of breaking equality, and
  * unrelated names stay below threshold. */
class PprlSpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    (1L, "johnathan smith"),
    (2L, "elizabeth jones"),
    (3L, "marcus aurelius")).toDF("id", "name")

  // the other party's copy: one typo in each name
  private val other = Seq(
    (11L, "jonathan smith"),   // dropped 'h'
    (12L, "elizabeth joness"), // doubled 's'
    (13L, "markus aurelius")   // c -> k
  ).toDF("id", "name")

  test("encodings expose only (k, pos) — never plaintext") {
    val enc = Pprl.clk(people, "id", "name")
    assert(enc.columns.toSeq === Seq("k", "pos"))
    val poss = enc.as[(Long, Long)].collect()
    assert(poss.nonEmpty && poss.forall { case (_, p) => p >= 0 && p < 64 })
  }

  test("typo'd counterparts match; unrelated names do not") {
    val m = Pprl.diceMatch(people, other, "id", "name",
        blockLen = 1, threshold = 0.7)
      .select(col("ka"), col("kb"), col("dice"))
      .as[(Long, Long, Double)].collect()
    val pairs = m.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 11L)), s"typo pair must match: ${m.mkString(",")}")
    assert(pairs.contains((2L, 12L)))
    assert(pairs.contains((3L, 13L)))
    assert(m.forall(_._3 < 1.0), "typos must degrade Dice below exact-match 1.0")
    assert(!pairs.exists { case (a, b) => (a, b) match {
      case (1L, x) if x != 11L => true
      case (2L, x) if x != 12L => true
      case (3L, x) if x != 13L => true
      case _ => false
    }}, s"no cross matches expected: ${m.mkString(",")}")
  }

  test("identical names Dice to exactly 1.0") {
    val m = Pprl.diceMatch(people, people, "id", "name",
        blockLen = 1, threshold = 0.99)
      .select(col("ka"), col("kb"), col("dice"))
      .as[(Long, Long, Double)].collect()
    assert(m.length === 3 && m.forall(_._3 === 1.0))
  }
}
