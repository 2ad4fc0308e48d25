package graft

import org.apache.spark.sql.functions._
import graft.queries.{Clustering, Similarity}
import graft.{Tables => T}

/** k-means + SemDeDup invariants beyond the DuckDB hash gate. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val c1 = Clustering.c1Kmeans.run(spark, sfDir).cache()
  private lazy val d7 = Clustering.d7SemanticDedup.run(spark, sfDir).cache()

  test("every vector is assigned to exactly one cell") {
    val n = T.embeddings(spark, sfDir).count()
    assert(c1.count() === n)
    assert(c1.select("vec_id").distinct().count() === n)
  }

  test("cell labels come from the deterministic init sample and sizes sum to N") {
    val cells = c1.select("cell").distinct().as[Long].collect()
    assert(cells.forall(_ % 37 === 0))
    val sized = c1.select("cell", "cell_n").distinct()
      .agg(sum("cell_n")).as[Long].head()
    assert(sized === T.embeddings(spark, sfDir).count())
  }

  test("Lloyd rounds do not degrade the clustering objective (mean cosine to centroid)") {
    // mean cosine-to-assigned-centroid after 2 rounds >= after 0 rounds
    // (cosine to the rounded integer mean; rounding noise is << the gap)
    def objective(iters: Int): Double = {
      val embq = T.embeddings(spark, sfDir)
        .select(col("vec_id"), expr(
          "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(10,6)) * 1000000 AS BIGINT))").as("q"))
      val asg = Clustering.kmeansAssign(embq, iters)
      // recompute cosine of each vector to its cell's final centroid via
      // the member-sum (cosine is scale-invariant: mean ≡ sum)
      val sums = asg.join(embq, Seq("vec_id"))
        .select(col("cell"), posexplode(col("q")).as(Seq("i", "x")))
        .groupBy("cell", "i").agg(sum("x").as("s"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("i"), col("s")))).as("sc"))
        .select(col("cell"), expr("transform(sc, p -> p.s)").as("ceq"))
      asg.join(embq, Seq("vec_id")).join(sums, Seq("cell"))
        .select(
          (graft.functions.ArrayLongDot.dotQ(col("q"), col("ceq")).cast("double") /
            (sqrt(graft.functions.ArrayLongDot.dotQ(col("q"), col("q")).cast("double")) *
             sqrt(graft.functions.ArrayLongDot.dotQ(col("ceq"), col("ceq")).cast("double")))).as("cos"))
        .agg(avg("cos")).as[Double].head()
    }
    assert(objective(2) >= objective(0) - 1e-9)
  }

  test("d7 drops exactly the vectors with a smaller-id in-cell near-duplicate") {
    // brute-force recompute at sf0.001: for every same-cell pair with
    // cosine >= 0.3, the larger id must be dropped; everything else kept
    val emb = T.embeddings(spark, sfDir)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(10,6)) * 1000000 AS BIGINT))").as("q"))
    val asg = d7.select("vec_id", "cell")
    val v = asg.join(emb, Seq("vec_id"))
    val expectDropped = v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(
        (graft.functions.ArrayLongDot.dotQ(col("a.q"), col("b.q")).cast("double") / lit(1e12)) /
          (sqrt(graft.functions.ArrayLongDot.dotQ(col("a.q"), col("a.q")).cast("double") / lit(1e12)) *
           sqrt(graft.functions.ArrayLongDot.dotQ(col("b.q"), col("b.q")).cast("double") / lit(1e12))) >= 0.3)
      .select(col("b.vec_id")).distinct().as[Long].collect().toSet
    val gotDropped = d7.filter(!col("kept")).select("vec_id").as[Long].collect().toSet
    assert(gotDropped === expectDropped)
    assert(d7.count() === T.embeddings(spark, sfDir).count())
  }

  test("persistent model: saved centroids assign the training corpus identically") {
    val path = java.nio.file.Files.createTempDirectory("kmeans-model").toString + "/m"
    val emb0 = T.embeddings(spark, sfDir).select("vec_id", "embedding")
    Clustering.trainKmeans(emb0, path, iters = 2)
    val viaModel = Clustering.assignWithModel(spark, path, emb0)
      .as[(Long, Long)].collect().toMap
    val inFlight = c1.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(viaModel === inFlight)
    // model is k rows — broadcastable by construction
    assert(spark.read.parquet(path).count() <= 64)
  }

  test("streaming assignment routes batches through the saved model identically") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("kmeans-stream").toString
    val model = s"$tmp/model"
    val emb0 = T.embeddings(spark, sfDir).select("vec_id", "embedding")
    Clustering.trainKmeans(emb0, model, iters = 2)
    val input = MemoryStream[(Long, Array[Float])]
    val q = Clustering.streamingAssign(
      input.toDF().toDF("vec_id", "embedding"), model, s"$tmp/out", s"$tmp/ckpt")
    val rows = emb0.as[(Long, Array[Float])].collect()
    input.addData(rows.take(10).toSeq); q.processAllAvailable()
    input.addData(rows.slice(10, 25).toSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$tmp/out/batch=0", s"$tmp/out/batch=1")
      .as[(Long, Long)].collect().toMap
    val direct = Clustering.assignWithModel(spark, model,
        emb0.filter(col("vec_id").isin(rows.take(25).map(_._1).toIndexedSeq: _*)))
      .as[(Long, Long)].collect().toMap
    assert(streamed === direct)
  }

  test("v6 JL projection roughly preserves pairwise cosine ordering (correlation > 0.4)") {
    // Johnson-Lindenstrauss sanity: for the first 30 vectors, pairwise
    // cosine in 16-dim projected space should correlate with the true
    // 64-dim cosine. ±1 projections at k=16 carry ~1/√k ≈ 0.25 distance
    // error on near-orthogonal random vectors, which caps the observable
    // correlation near ~0.5 — pin clearly above chance, below the cap.
    val proj = graft.queries.Similarity.v6RandomProjection.run(spark, sfDir)
      .filter(col("vec_id") < 30)
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("j"), col("pr")))).as("sc"))
      .select(col("vec_id"), expr("transform(sc, p -> CAST(p.pr AS DOUBLE))").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val orig = T.embeddings(spark, sfDir).filter(col("vec_id") < 30)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap.map { case (k, v) => k -> v.map(_.toDouble) }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ids = orig.keys.toSeq.sorted
    val pairs = for (i <- ids; jj <- ids if i < jj) yield (cos(orig(i), orig(jj)), cos(proj(i), proj(jj)))
    val (xs, ys) = pairs.unzip
    val n = xs.size.toDouble
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val r = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      (math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum) * math.sqrt(ys.map(y => (y - my) * (y - my)).sum))
    assert(r > 0.4, s"JL correlation too weak: $r")
  }

  test("cleanup leaves no cached frames") {
    c1.unpersist(); d7.unpersist()
    // kmeansAssign persists the quantized corpus for its rounds (see its
    // doc): the documented caller contract is clearCache when done
    spark.sharedState.cacheManager.clearCache()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
