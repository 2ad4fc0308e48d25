package graft.sources

import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
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
  * but it holds only raw page JSON; item explosion and parsing run
  * distributed via from_json on executors (the reference accumulates
  * every parsed row in driver memory, src/square.ts:47,84). For feeds
  * that publish a page manifest, prefer the DSv2
  * [[graft.sources.dsv2.PagedJsonSource]]: it fetches pages in parallel
  * on executors and prunes them at planning time.
  */
object HttpCursorSource {

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** Walk the cursor chain; returns one DataFrame row per element of the
    * response's `itemsField` array, parsed against `itemSchema`. */
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
      fetcher: Option[PageFetcher] = None): DataFrame = {
    val f = new RetryingFetcher(
      fetcher.getOrElse(new HttpPageFetcher(headers)), maxAttempts, baseBackoffMs)
    val mapper = new ObjectMapper()
    val pages = mutable.Buffer.empty[String]
    var cursor: Option[String] = None
    var first = true
    while (first || cursor.isDefined) {
      first = false
      val qs = (params ++ cursor.map(cursorParam -> _))
        .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
      val url = if (qs.isEmpty) baseUrl else s"$baseUrl?$qs"
      val body = f.open(url).mkString("\n")
      pages += body
      cursor = Option(mapper.readTree(body).get(cursorField))
        .filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
    }

    import spark.implicits._
    val pageSchema = StructType(Seq(
      StructField(itemsField, ArrayType(itemSchema))))
    spark.createDataset(pages.toSeq)
      .select(from_json(col("value"), pageSchema).as("page"))
      .select(explode_outer(col(s"page.$itemsField")).as("item"))
      .filter(col("item").isNotNull)
      .select(col("item.*"))
  }
}
