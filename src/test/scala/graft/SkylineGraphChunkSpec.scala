package graft

import org.apache.spark.sql.functions._
import graft.queries.{Extras, Graphs, TrainPrep}

/** Semantic evidence for the round-5 additions beyond the oracle gate:
  * the skyline really is the non-dominated set, the triangle count agrees
  * with a brute-force adjacency recount, chunking reconstructs each
  * document exactly, and containment flags exactly the seeded docs.
  */
class SkylineGraphChunkSpec extends SparkSpec {

  test("a24 pareto front is exactly the non-dominated set (quadratic recheck)") {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_size", "p_retailprice")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def dominated(p: (Long, Int, Double)) = parts.exists { q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3)
    }
    val expected = parts.filterNot(dominated).map(_._1).toSet
    val got = Extras.a24ParetoFront.run(spark, sfDir)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("g2 triangle count agrees with brute-force adjacency recount") {
    val it = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = it.as("x").join(it.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("u"), col("y.p").as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
      .withDefaultValue(Set.empty[Long])
    // brute force: for each edge (u,v) with u<v, count common forward neighbors
    val brute = edges.toSeq.map { case (u, v) => (adj(u) & adj(v)).size }.sum
    val row = Graphs.g2TriangleCount.run(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_edges") === edges.size.toLong)
    assert(row.getAs[Long]("n_triangles") === brute.toLong)
  }

  test("t21 chunks reconstruct every document exactly and cover it fully") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(length(col("text")) > 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TrainPrep.t21ChunkOverlap.run(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (id, cs) =>
      val text = docs(id)
      val sorted = cs.sortBy(_._2)
      // chunk_ids are consecutive from 0; offsets stride by 90
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong))
      sorted.foreach { case (_, cid, off, chunk) =>
        assert(off === cid * 90)
        assert(chunk === text.substring(off.toInt, math.min(off.toInt + 120, text.length)))
      }
      // stitching chunk 0 plus each successor's non-overlapping tail at its
      // offset reproduces the document: full coverage, nothing missing
      val stitched = new StringBuilder
      sorted.foreach { case (_, _, off, chunk) =>
        val keepFrom = (stitched.length - off.toInt).max(0)
        stitched.append(chunk.substring(keepFrom.min(chunk.length)))
      }
      assert(stitched.toString === text)
    }
  }

  test("v8 MMR picks equal a driver-side greedy recomputation") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1).map { f =>
          new JBD(f.toDouble).setScale(6, RoundingMode.HALF_UP)
            .movePointRight(6).longValueExact()
        }.toArray
      }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      (dot.toDouble / 1e12) / (math.sqrt(na.toDouble / 1e12) * math.sqrt(nb.toDouble / 1e12))
    }
    val q = emb(0L)
    val rel = emb.collect { case (id, v) if id != 0L => id -> cos(v, q) }
    val short = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(50)
    val p1 = short.head._1
    val m2 = short.filter(_._1 != p1).map { case (id, r) =>
      (id, r, cos(emb(id), emb(p1))) }
    val p2 = m2.map { case (id, r, s1) => (id, 0.7 * r - 0.3 * s1) }
      .minBy { case (id, m) => (-m, id) }._1
    val p3 = m2.filter(_._1 != p2).map { case (id, r, s1) =>
        (id, 0.7 * r - 0.3 * math.max(s1, cos(emb(id), emb(p2)))) }
      .minBy { case (id, m) => (-m, id) }._1
    val got = queries.Similarity.v8MmrRerank.run(spark, sfDir)
      .orderBy("rank").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got === Seq(p1, p2, p3))
    assert(got.distinct.size === 3)
  }

  test("d10 flags exactly the seeded quoting docs with high containment") {
    // sf0.001 has only eval doc 0, so seeding applies to doc_id%31==0 &&
    // doc_id%3==0 — run on sf0.01 where all three eval sources exist
    val out = TrainPrep.d10ContainmentPairs.run(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val docId = r.getAs[Long]("doc_id")
      val cont = r.getAs[Double]("containment")
      assert(docId % 31 === 0, s"unseeded doc $docId flagged")
      assert(docId % 97 !== 0)
      assert(cont >= 0.25)
      assert(r.getAs[Long]("eval_id") === 97L * (docId % 3))
    }
  }
}
