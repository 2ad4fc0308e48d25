package graft.queries

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables => T}

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * v1 is the exact baseline: broadcast the (small) query set against all
  * candidates and score with array expressions — per-row dot products
  * stay inside whole-stage codegen, no explode. At cluster scale the
  * candidate side stays partitioned; only the query set moves.
  *
  * v2 is the scale path: random-hyperplane LSH. Bucket signatures are
  * computed per-row against constant (folded) sign vectors derived from
  * md5 — deterministic, so the DuckDB oracle reproduces them bit-for-bit.
  * Search cost drops from O(N) to O(bucket).
  *
  * Oracle parity: embedding floats are quantized to DECIMAL(10,6) and all
  * dot/norm sums run in exact decimal (order-independent); only the final
  * cosine division happens in double (single IEEE op — identical in both
  * engines).
  */
object Similarity {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Deterministic ±1 hyperplane component for (plane, dim), dims 1-based. */
  private def sign(plane: Int, dim: Int): Int =
    if (md5Hex(s"$plane-$dim").charAt(0) < '8') 1 else -1

  private val nPlanes = 8
  private val dim = 64

  /** Exact decimal dot product of two float-array columns. */
  private def dotDec(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(CAST(x AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(y AS DOUBLE) AS DECIMAL(10,6))), CAST(0 AS DECIMAL(37,12)), (acc, v) -> CAST(acc + v AS DECIMAL(37,12)))")

  private def cosine: Column =
    col("dot").cast("double") /
      (sqrt(col("nx").cast("double")) * sqrt(col("ny").cast("double")))

  /** Attach `bucket` to a frame holding `embedding`. */
  private def bucketed(df: DataFrame, embedding: String): DataFrame = {
    val withSigns = (0 until nPlanes).foldLeft(df) { (acc, p) =>
      acc.withColumn(s"__signs$p", array((1 to dim).map(d => lit(sign(p, d))): _*))
    }
    val withProj = (0 until nPlanes).foldLeft(withSigns) { (acc, p) =>
      acc.withColumn(s"__proj$p", expr(
        s"aggregate(zip_with($embedding, __signs$p, (x, s) -> CAST(CAST(x AS DOUBLE) AS DECIMAL(10,6)) * s), CAST(0 AS DECIMAL(37,12)), (acc, v) -> CAST(acc + v AS DECIMAL(37,12)))"))
    }
    withProj
      .withColumn("bucket", concat((0 until nPlanes).map(p =>
        when(col(s"__proj$p") > 0, "1").otherwise("0")): _*))
      .drop(((0 until nPlanes).map(p => s"__signs$p") ++ (0 until nPlanes).map(p => s"__proj$p")): _*)
  }

  private val sqlDot =
    "sum(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6)))"

  // --- v1_knn_bruteforce: exact cosine top-10 per query vector ---
  val v1KnnBruteforce = QueryDef.sql(
    "v1_knn_bruteforce",
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
       |pr AS (SELECT qid, c.vec_id AS cid, qe, c.embedding AS ce FROM q, embeddings c WHERE c.vec_id <> qid),
       |u AS (SELECT qid, cid, unnest(qe) AS x, unnest(ce) AS y FROM pr),
       |dots AS (SELECT qid, cid,
       |    sum(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6))) AS dot,
       |    sum(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6))) AS nx,
       |    sum(CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6))) AS ny
       |  FROM u GROUP BY qid, cid),
       |scored AS (SELECT qid, cid,
       |    CAST(dot AS DOUBLE) / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(ny AS DOUBLE))) AS cosine
       |  FROM dots)
       |SELECT qid, cid, cosine, rank FROM (
       |  SELECT qid, cid, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
       |  FROM scored) t
       |WHERE rank <= 10""".stripMargin) { (s, d) =>
    val emb = T.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("dot", dotDec("qe", "ce"))
      .withColumn("nx", dotDec("qe", "qe"))
      .withColumn("ny", dotDec("ce", "ce"))
      .withColumn("cosine", cosine)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  // --- v2_ann_lsh: hyperplane-LSH bucketed ANN, exact rescoring in-bucket ---
  val v2AnnLsh = QueryDef.sql(
    "v2_ann_lsh", {
      val signCase =
        """CASE WHEN substr(md5(CAST(p AS VARCHAR) || '-' || CAST(dim AS VARCHAR)), 1, 1)
          |  IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END""".stripMargin
      s"""WITH signs AS (SELECT p, dim, $signCase AS sgn
         |  FROM (SELECT unnest(range(0, $nPlanes)) AS p) planes,
         |       (SELECT unnest(range(1, ${dim + 1})) AS dim) dims),
         |uv AS (SELECT vec_id, unnest(embedding) AS x, unnest(range(1, ${dim + 1})) AS dim FROM embeddings),
         |proj AS (SELECT vec_id, p, sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(10,6)) * sgn) AS pr
         |         FROM uv JOIN signs USING (dim) GROUP BY vec_id, p),
         |buckets AS (SELECT vec_id, string_agg(CASE WHEN pr > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
         |            FROM proj GROUP BY vec_id),
         |q AS (SELECT e.vec_id AS qid, e.embedding AS qe, b.bucket
         |      FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id WHERE e.vec_id < 5),
         |cand AS (SELECT q.qid, e.vec_id AS cid, q.qe, e.embedding AS ce
         |         FROM q JOIN buckets b ON q.bucket = b.bucket
         |         JOIN embeddings e ON e.vec_id = b.vec_id
         |         WHERE e.vec_id <> q.qid),
         |u AS (SELECT qid, cid, unnest(qe) AS x, unnest(ce) AS y FROM cand),
         |dots AS (SELECT qid, cid,
         |    sum(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6))) AS dot,
         |    sum(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6))) AS nx,
         |    sum(CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6))) AS ny
         |  FROM u GROUP BY qid, cid),
         |scored AS (SELECT qid, cid,
         |    CAST(dot AS DOUBLE) / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(ny AS DOUBLE))) AS cosine
         |  FROM dots)
         |SELECT qid, cid, cosine, rank FROM (
         |  SELECT qid, cid, cosine,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
         |  FROM scored) t
         |WHERE rank <= 10""".stripMargin
    }) { (s, d) =>
    val emb = bucketed(T.embeddings(s, d), "embedding")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("cid") =!= col("qid"))
      .withColumn("dot", dotDec("qe", "ce"))
      .withColumn("nx", dotDec("qe", "qe"))
      .withColumn("ny", dotDec("ce", "ce"))
      .withColumn("cosine", cosine)
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  // --- v3_embedding_neardup: all-pairs near-duplicate detection via LSH
  // buckets (cosine ≥ 0.4 within bucket; the fixture embeddings have no planted near-dups — max all-pairs cosine ≈ 0.51 — so the threshold is set where signal exists) — dedup by embedding similarity ---
  val v3EmbeddingNeardup = QueryDef.sql(
    "v3_embedding_neardup", {
      val signCase =
        """CASE WHEN substr(md5(CAST(p AS VARCHAR) || '-' || CAST(dim AS VARCHAR)), 1, 1)
          |  IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END""".stripMargin
      s"""WITH signs AS (SELECT p, dim, $signCase AS sgn
         |  FROM (SELECT unnest(range(0, $nPlanes)) AS p) planes,
         |       (SELECT unnest(range(1, ${dim + 1})) AS dim) dims),
         |uv AS (SELECT vec_id, unnest(embedding) AS x, unnest(range(1, ${dim + 1})) AS dim FROM embeddings),
         |proj AS (SELECT vec_id, p, sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(10,6)) * sgn) AS pr
         |         FROM uv JOIN signs USING (dim) GROUP BY vec_id, p),
         |buckets AS (SELECT vec_id, string_agg(CASE WHEN pr > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
         |            FROM proj GROUP BY vec_id),
         |pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2, ea.embedding AS qe, eb.embedding AS ce
         |          FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |          JOIN embeddings ea ON ea.vec_id = a.vec_id
         |          JOIN embeddings eb ON eb.vec_id = b.vec_id),
         |u AS (SELECT id1, id2, unnest(qe) AS x, unnest(ce) AS y FROM pairs),
         |dots AS (SELECT id1, id2,
         |    sum(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6))) AS dot,
         |    sum(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.x AS DOUBLE) AS DECIMAL(10,6))) AS nx,
         |    sum(CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6)) * CAST(CAST(u.y AS DOUBLE) AS DECIMAL(10,6))) AS ny
         |  FROM u GROUP BY id1, id2)
         |SELECT id1, id2,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(ny AS DOUBLE))) AS cosine
         |FROM dots
         |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(ny AS DOUBLE))) >= 0.4""".stripMargin
    }) { (s, d) =>
    val emb = bucketed(T.embeddings(s, d), "embedding")
    val a = emb.select(col("vec_id").as("id1"), col("embedding").as("qe"), col("bucket"))
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("ce"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("dot", dotDec("qe", "ce"))
      .withColumn("nx", dotDec("qe", "qe"))
      .withColumn("ny", dotDec("ce", "ce"))
      .withColumn("cosine", cosine)
      .filter(col("cosine") >= 0.4)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  val all: Seq[QueryDef] = Seq(v1KnnBruteforce, v2AnnLsh, v3EmbeddingNeardup)
}
