package graft

import org.apache.spark.sql.functions._
import graft.operators.{Versioned, VersionedText}

/** Transactionally-maintained token-bloom text index: conjunctive term
  * lookup ≡ full scan + token filter, pruning is real for rare tokens,
  * a text edit updates the partition's bloom in the same transaction,
  * and the probe hash can never drift from the build hash (both sides
  * share the string-typed position expression). */
class VersionedTextSpec extends SparkSpec {

  import spark.implicits._

  // small bit space keeps fixture blooms readable; pruning assertions
  // use doc-unique tokens so a false positive can only ADD partitions
  private val Bits = 1 << 14

  private def fixture() = {
    val root = java.nio.file.Files.createTempDirectory("graft-vtext").toString
    val tbl = s"$root/t"; val idx = s"$root/x"
    // 90 docs over 3 partitions; every doc carries the shared token
    // "common", its partition's token "part<p>", and a doc-unique
    // token "uniq<k>"
    val base = (0 until 90).map { i =>
      val p = i % 3
      (i.toLong, s"p$p", s"common part$p uniq$i filler words here")
    }.toDF("k", "part", "text")
    VersionedText.commitIndexed(spark, s"$root/tx1", tbl, idx, base,
      "part", Seq("k"), "text", bits = Bits)
    (root, tbl, idx, base)
  }

  test("conjunctive lookup equals full scan + token filter") {
    val (_, tbl, idx, _) = fixture()
    for (terms <- Seq(Seq("common"), Seq("part1"), Seq("uniq42"),
        Seq("part0", "common"), Seq("uniq3", "part0"))) {
      val pruned = VersionedText.lookupAll(spark, tbl, idx, "text", terms, Bits)
        .collect().map(_.toString).sorted.toSeq
      val full = Versioned.readAsOf(spark, tbl)
        .filter(terms.map(t =>
          array_contains(VersionedText.tokens(col("text")), t)).reduce(_ && _))
        .collect().map(_.toString).sorted.toSeq
      assert(pruned === full, s"terms=$terms")
      assert(pruned.nonEmpty, s"probe $terms must hit fixture rows")
    }
  }

  test("a disjoint conjunction positively returns zero rows") {
    val (_, tbl, idx, _) = fixture()
    // uniq tokens live in different docs — no doc holds both
    assert(VersionedText.lookupAll(spark, tbl, idx, "text",
      Seq("uniq3", "uniq4"), Bits).count() === 0L)
  }

  test("pruning is real: a partition-local token opens only its partition") {
    val (_, tbl, idx, _) = fixture()
    assert(VersionedText.candidatePartitions(spark, idx, Seq("part1"), Bits)
      === Seq("p1"))
    // conjoining a shared token cannot widen past the rare token's set
    assert(VersionedText.candidatePartitions(spark, idx,
      Seq("part1", "common"), Bits) === Seq("p1"))
    // a token absent from the corpus resolves to no candidates (modulo
    // bloom false positives — with this fixture's tiny vocabulary the
    // fill factor makes a double-position collision implausible)
    assert(VersionedText.candidatePartitions(spark, idx,
      Seq("zzabsenttoken"), Bits).isEmpty)
    // EXECUTED-plan evidence: the pruned read scans at most one
    // partition's 30 docs
    val metrics = graft.plans.PlanMetrics.actualRows(
      VersionedText.lookupAll(spark, tbl, idx, "text", Seq("part1"), Bits))
    val scanRows = metrics.filter(_.node.toLowerCase.contains("scan parquet"))
      .flatMap(_.outputRows).sum
    assert(scanRows <= 30L && scanRows > 0L,
      s"pruned read must stay within one partition's rows, got $scanRows")
  }

  test("a text edit is visible through the token index in the same commit") {
    val (root, tbl, idx, base) = fixture()
    // doc 3 (p0) gains a brand-new token in a second transactional commit
    val delta = base.filter(col("k") === 3L)
      .withColumn("text", concat(col("text"), lit(" freshtoken")))
    val got = VersionedText.commitIndexed(spark, s"$root/tx2", tbl, idx, delta,
      "part", Seq("k"), "text", bits = Bits)
    assert(got === Map(tbl -> 2L, idx -> 2L))
    // the new token immediately resolves through the BLOOM (not the
    // tv-staleness fallback: candidatePartitions has no fallback)
    assert(VersionedText.candidatePartitions(spark, idx, Seq("freshtoken"), Bits)
      === Seq("p0"))
    val hit = VersionedText.lookupAll(spark, tbl, idx, "text",
      Seq("freshtoken"), Bits).select(col("k")).collect().map(_.getLong(0)).toSeq
    assert(hit === Seq(3L))
    // untouched partitions kept their index rows at tv=1; p0 moved to 2
    val tvs = Versioned.readAsOf(spark, idx)
      .select(col("pval"), col("tv")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tvs === Map("p0" -> 2L, "p1" -> 1L, "p2" -> 1L))
  }

  test("empty-token and empty-text rows never poison the index") {
    val root = java.nio.file.Files.createTempDirectory("graft-vtext2").toString
    val tbl = s"$root/t"; val idx = s"$root/x"
    val rows = Seq(
      (0L, "p0", "alpha beta"), (1L, "p0", ""), (2L, "p1", "   "),
      (3L, "p1", "gamma")).toDF("k", "part", "text")
    VersionedText.commitIndexed(spark, s"$root/tx", tbl, idx, rows,
      "part", Seq("k"), "text", bits = Bits)
    // blank docs contribute no tokens; lookups stay exact
    val n = Versioned.readAsOf(spark, idx)
      .select(col("pval"), col("n_terms")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n === Map("p0" -> 2L, "p1" -> 1L))
    assert(VersionedText.lookupAll(spark, tbl, idx, "text", Seq("gamma"), Bits)
      .select(col("k")).collect().map(_.getLong(0)).toSeq === Seq(3L))
  }
}
