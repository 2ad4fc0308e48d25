package graft

import org.apache.spark.sql.functions._
import graft.queries.{TrainPrep, TextDedup}

/** End-to-end corpus preparation: the composed pipeline's invariants on
  * the real fixture corpus — every stage's contract must survive
  * composition, not just hold in isolation.
  */
class PrepareCorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = TrainPrep.prepareCorpus(spark, sfDir)
  private lazy val rows = out.collect()

  test("survivors are unique, non-eval, and quota-bounded per language") {
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length === ids.length, "no doc appears twice")
    assert(ids.forall(_ % 97 != 0), "eval docs never reach the training corpus")
    val perLang = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    perLang.foreach { case (lang, n) =>
      val cap = if (lang == "en") 80 else 30
      assert(n <= cap, s"$lang exceeded its quota: $n > $cap")
    }
    assert(rows.nonEmpty, "the fixture corpus must yield survivors")
  }

  test("no exact duplicates survive (fingerprint check on the output ids)") {
    val survivors = out.select("doc_id")
    val fps = Tables.documents(spark, sfDir)
      .join(survivors, Seq("doc_id"), "left_semi")
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
      .groupBy("fp").count().filter(col("count") > 1).count()
    assert(fps === 0, "two surviving docs share a fingerprint")
  }

  test("near-dup clusters kept exactly one member") {
    // recompute the near-dup pairs over the corpus; no surviving pair
    // may have BOTH endpoints in the output
    val pairs = TextDedup.d3MinhashLsh.run(spark, sfDir)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect()
    val kept = rows.map(_.getLong(0)).toSet
    pairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"near-dup pair ($a, $b) both survived")
    }
  }

  test("the composed pipeline is deterministic end to end") {
    val again = TrainPrep.prepareCorpus(spark, sfDir).collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(again.map(key).toSet === rows.map(key).toSet,
      "re-running the pipeline must reproduce the exact same packed corpus")
  }

  test("optional SemDeDup stage: drops exactly the embedding near-dups, rest unchanged") {
    // vec_id = doc_id convention: every doc in the embeddings frame is
    // screened; docs without an embedding must pass through untouched
    // unbind the mixture quota so the comparison isn't blurred by
    // rank-shift refills (dropping a doc lets the next hash-rank in)
    val noQuota = lit(1000000)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val withSem = TrainPrep.prepareCorpus(spark, sfDir, quota = noQuota, embeddings = Some(emb))
      .select("doc_id").as[Long].collect().toSet
    val without = TrainPrep.prepareCorpus(spark, sfDir, quota = noQuota)
      .select("doc_id").as[Long].collect().toSet
    assert(withSem.subsetOf(without))
    // the screen can only remove docs that actually have an embedding
    val embIds = emb.select("vec_id").as[Long].collect().toSet
    val dropped = without -- withSem
    assert(dropped.subsetOf(embIds))
    // and with no embeddings supplied the stage is the identity
    assert(TrainPrep.prepareCorpus(spark, sfDir, quota = noQuota, embeddings = None)
      .select("doc_id").as[Long].collect().toSet === without)
  }

  test("verbatim screen (5b) drops exactly the docs containing an eval prefix") {
    val noQuota = lit(1000000)
    val withScreen = TrainPrep.prepareCorpus(spark, sfDir, quota = noQuota)
      .select("doc_id").as[Long].collect().toSet
    val without = TrainPrep.prepareCorpus(spark, sfDir, quota = noQuota, verbatimProbeLen = 0)
      .select("doc_id").as[Long].collect().toSet
    assert(withScreen.subsetOf(without))
    // every dropped doc really contains some eval doc's canonical prefix
    val dropped = without -- withScreen
    if (dropped.nonEmpty) {
      import graft.functions.NfcNormalize
      val docs = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), NfcNormalize.of(col("text")).as("text"))
      val probes = docs.filter(col("doc_id") % 97 === 0 && length(col("text")) >= 20)
        .select(substring(col("text"), 1, 20).as("p")).as[String].collect()
      val leaky = docs.filter(col("doc_id").isin(dropped.toSeq: _*))
        .as[(Long, String)].collect()
      leaky.foreach { case (id, t) =>
        assert(probes.exists(t.contains), s"doc $id dropped without a matching eval prefix")
      }
    }
  }

  test("packing invariants: offsets inside the budget, packs dense per stratum") {
    rows.foreach { r =>
      val off = r.getLong(4)
      assert(off >= 0 && off < 512, s"pack_offset $off outside [0, 512)")
    }
    // within each (lang, pack) the offsets are strictly increasing in doc order
    rows.groupBy(r => (r.getString(1), r.getLong(0) % 8, r.getLong(3))).foreach {
      case (_, group) =>
        val sorted = group.sortBy(_.getLong(0))
        val offs = sorted.map(_.getLong(4))
        assert(offs === offs.sorted, "offsets must be monotone within a pack")
    }
  }
}
