package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the statistical / evaluation / pipeline
  * queries (beyond the oracle hash gate, which pins exact values):
  * range invariants, membership laws, and cross-query consistency. */
class StatsAndEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("a27/g5: correlation-family outputs stay within [-1, 1]") {
    val corrs = run("a27_exact_corr").select("corr_qty_price").as[Double].collect() ++
      run("g5_assortativity").select("assortativity").as[Double].collect()
    assert(corrs.nonEmpty && corrs.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("c2: silhouette scores are per-cell means within [-1, 1] covering every c1 cell") {
    val sil = run("c2_silhouette")
      .select("cell", "mean_silhouette").as[(Long, Double)].collect().toMap
    assert(sil.values.forall(s => s >= -1.0 && s <= 1.0))
    val cells = run("c1_kmeans").select("cell").distinct().as[Long].collect().toSet
    assert(sil.keySet === cells)
  }

  test("v11: SQ8 returns 10 exact-ranked neighbors per query from byte-range codes") {
    val rows = run("v11_sq8_knn")
      .select("qid", "cid", "d2", "rank").as[(Long, Long, Long, Int)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { ns =>
      assert(ns.map(_._4).toSet === (1 to 10).toSet)
      // distances are non-decreasing in rank and bounded by the 64-dim
      // byte-code maximum 64 * 255²
      val sorted = ns.sortBy(_._4).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
      assert(sorted.forall(d2 => d2 >= 0 && d2 <= 64L * 255 * 255))
    }
  }

  test("v12: ANN recall@10 is hits/10 over v1's exact sets and stays in [0, 1]") {
    val rec = run("v12_ann_recall")
      .select("qid", "hits", "recall_at_10").as[(Long, Long, Double)].collect()
    assert(rec.map(_._1).toSet === Set(0L, 1L, 2L, 3L, 4L))
    rec.foreach { case (_, hits, r) =>
      assert(hits >= 0 && hits <= 10 && math.abs(r - hits / 10.0) < 1e-12)
    }
  }

  test("d11: every keeper belongs to its cluster and carries the cluster's max n_chars") {
    val keepers = run("d11_cluster_survivor")
      .select("cluster_id", "keeper_id", "n_members", "keeper_chars")
      .as[(Long, Long, Long, Long)].collect()
    val clusters = run("d6_dedup_clusters")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val chars = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(keepers.map(_._1).toSet === clusters.keySet)
    keepers.foreach { case (cl, keeper, n, kc) =>
      val members = clusters(cl)
      assert(members.contains(keeper))
      assert(n === members.size)
      assert(kc === members.map(chars).max)
    }
  }

  test("g4: BFS distances are 0 exactly on seeds and bounded by the 3-round budget") {
    val dist = run("g4_shortest_path")
      .select("part_id", "dist").as[(Long, Int)].collect().toMap
    assert(dist.values.forall(d => d >= 0 && d <= 3))
    val seeds = dist.filter(_._2 == 0).keySet
    assert(seeds.nonEmpty && seeds.forall(_ % 97 == 0))
    assert(dist.filter(_._2 > 0).keySet.forall(_ % 97 != 0))
  }

  test("e13: conversion lags are non-negative and purchase never precedes the first view") {
    val rows = run("e13_conversion_lag")
      .select(col("lag_minutes"),
        (col("first_purchase") >= col("first_view")).as("ok"))
      .as[(Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall { case (lag, ok) => lag >= 0 && ok })
  }

  test("e14: MAD is non-negative and outliers never exceed the group size") {
    val rows = run("e14_robust_zscore")
      .select("mad", "n_outliers", "n").as[(Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (mad, out, n) => assert(mad >= 0 && out >= 0 && out <= n) }
  }

  test("t15: the split is a partition of the corpus and equal text lands in one split") {
    val rows = run("t15_leak_safe_split")
      .select("doc_id", "fp", "split").as[(Long, String, String)].collect()
    assert(rows.length === Tables.documents(spark, sfDir).count())
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // leakage law: one fingerprint → one split
    rows.groupBy(_._2).values.foreach(g => assert(g.map(_._3).toSet.size === 1))
  }

  test("t24: PMI rows arrive top-20, ordered, with support >= 5") {
    val rows = run("t24_bigram_pmi")
      .select("ngram", "nxy", "pmi").as[(String, Long, Double)].collect()
    assert(rows.length <= 20)
    assert(rows.forall(_._2 >= 5))
    val pmis = rows.map(_._3)
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
  }
}
