package graft.sources.dsv2

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Rate-limited (HTTP 429): retryable after a backoff; the server's
  * Retry-After (seconds) is honored when present. Extends IOException so
  * transport-agnostic retry loops treat it as transient — but
  * [[RetryingFetcher]] matches it first to use the server-directed wait
  * (reference behavior: src/square.ts:69-73 sleeps and re-requests on
  * 429; everything else fails fast at :75-80). */
final case class RateLimitedException(retryAfterMs: Option[Long], url: String)
    extends java.io.IOException(s"429 rate limited: $url (Retry-After ms: $retryAfterMs)")

/** Non-retryable HTTP failure (4xx/5xx other than 429): the server
  * answered and said no — repeating the request won't help, so this is
  * NOT an IOException and propagates straight through retry loops. */
final case class PageFetchFailedException(status: Int, url: String, body: String)
    extends RuntimeException(s"page fetch failed: HTTP $status $url – ${body.take(200)}")

/** Production [[PageFetcher]]: one page = one HTTP GET via
  * `java.net.http.HttpClient` (JDK-only, no added dependency).
  *
  * Status mapping (reference: src/square.ts:69-80):
  *   - 2xx  → body lines
  *   - 429  → [[RateLimitedException]] carrying Retry-After, retryable
  *   - else → [[PageFetchFailedException]], fail fast
  *
  * Serializable for executor-side use; the client is rebuilt lazily per
  * JVM (HttpClient itself is not serializable).
  */
final class HttpPageFetcher(
    headers: Map[String, String] = Map.empty,
    requestTimeoutMs: Long = 30000) extends PageFetcher {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(requestTimeoutMs))
      .build()

  def open(url: String): Iterator[String] = {
    val builder = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .GET()
    headers.foreach { case (k, v) => builder.header(k, v) }
    val res = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    res.statusCode() match {
      case ok if ok >= 200 && ok < 300 =>
        res.body().linesIterator
      case 429 =>
        val retryAfterMs = {
          val ra = res.headers().firstValue("Retry-After")
          if (ra.isPresent) ra.get().toLongOption.map(_ * 1000L) else None
        }
        throw RateLimitedException(retryAfterMs, url)
      case status =>
        throw PageFetchFailedException(status, url, res.body())
    }
  }
}
