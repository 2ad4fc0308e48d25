package graft.sources

import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}
import graft.sources.dsv2.{HttpPageFetcher, PageFetcher, RetryingFetcher}

/** Cursor-paginated REST reader — the reference's scan protocol
  * (src/square.ts:43-91) re-expressed for Spark:
  *
  *   - time window as `begin_time`/`end_time` query params: the
  *     *server-side* predicate pushdown the API offers (src/square.ts:53-54);
  *   - `cursor` chaining until the response carries none (:57-59, :88-89);
  *   - 429 → wait and re-request, honoring Retry-After when present
  *     (the reference hardcodes 10 s, :69-73); other failures fail fast
  *     (:75-80) — both via [[RetryingFetcher]];
  *   - auth/version headers forwarded on every request (:62-66).
  *
  * A cursor chain is inherently sequential, so the driver walks pages —
  * but driver memory stays O(1 page): each raw body is spilled to a file
  * under `spillDir` as it arrives, and parsing/explosion runs distributed
  * over those files (the reference accumulates every parsed row in driver
  * memory, src/square.ts:47,84). Two runaway-feed guards: `maxPages`
  * bounds the walk, and a cursor value seen twice (a server echoing or
  * cycling cursors) fails fast instead of looping forever. For feeds that
  * publish a page manifest, prefer the DSv2
  * [[graft.sources.dsv2.PagedJsonSource]]: it fetches pages in parallel
  * on executors and prunes them at planning time.
  */
object HttpCursorSource {

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** Walk the cursor chain; returns one DataFrame row per element of the
    * response's `itemsField` array, parsed against `itemSchema`.
    *
    * @param maxPages hard bound on the walk — exceeding it throws rather
    *                 than silently truncating the feed
    * @param spillDir where raw page bodies land (any Hadoop-compatible
    *                 URI; on a multi-node cluster pass a SHARED path —
    *                 the default java temp dir is only visible to
    *                 single-JVM deployments). The returned DataFrame
    *                 reads these files lazily: the caller owns cleanup
    *                 after the result is consumed.
    */
  def read(
      spark: SparkSession,
      baseUrl: String,
      itemsField: String,
      itemSchema: StructType,
      params: Map[String, String] = Map.empty,
      headers: Map[String, String] = Map.empty,
      cursorField: String = "cursor",
      cursorParam: String = "cursor",
      maxAttempts: Int = 5,
      baseBackoffMs: Long = 100,
      fetcher: Option[PageFetcher] = None,
      maxPages: Int = 100000,
      spillDir: Option[String] = None): DataFrame = {
    val f = new RetryingFetcher(
      fetcher.getOrElse(new HttpPageFetcher(headers)), maxAttempts, baseBackoffMs)
    val mapper = new ObjectMapper()
    val dir = spillDir.getOrElse(
      graft.Scratch.dir("cursor-feed"))
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)

    val seenCursors = mutable.Set.empty[String] // cursors are tiny; bodies never retained
    var cursor: Option[String] = None
    var page = 0
    var first = true
    while (first || cursor.isDefined) {
      first = false
      if (page >= maxPages)
        throw new IllegalStateException(
          s"cursor walk exceeded maxPages=$maxPages at $baseUrl — raise maxPages " +
            "or narrow the requested window; refusing to truncate silently")
      val qs = (params ++ cursor.map(cursorParam -> _))
        .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
      val url = if (qs.isEmpty) baseUrl else s"$baseUrl?$qs"
      val body = f.open(url).mkString("\n")
      val out = fs.create(new Path(dirPath, f"page-$page%06d.json"), true)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      page += 1
      cursor = Option(mapper.readTree(body).get(cursorField))
        .filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
      cursor.foreach { c =>
        if (!seenCursors.add(c))
          throw new IllegalStateException(
            s"cursor walk at $baseUrl returned cursor '$c' twice — the server is " +
              "echoing or cycling cursors; aborting instead of looping")
      }
    }

    // one row per page FILE (wholetext), parsed and exploded on executors
    val pageSchema = StructType(Seq(
      StructField(itemsField, ArrayType(itemSchema))))
    spark.read.option("wholetext", "true").text(dir)
      .select(from_json(col("value"), pageSchema).as("page"))
      .select(explode_outer(col(s"page.$itemsField")).as("item"))
      .filter(col("item").isNotNull)
      .select(col("item.*"))
  }
}
