package graft.sources.dsv2

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.SupportsPushDownLimit
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for a *paged feed* — the engine-grade form of
  * the reference's cursor-paginated REST scans (S1-S6, reference:
  * src/square.ts:43-91). The feed is a directory of page files plus a
  * `manifest.jsonl` mapping each page to its `created_at` range (the
  * analog of the API's time-windowed cursor pages).
  *
  * What the reference hand-rolls, expressed as DSv2 machinery:
  *   - time-window predicate → `SupportsPushDownFilters`: `created_at`
  *     bounds prune whole pages at *planning* time via the manifest
  *     (the reference passes begin/end as query params;
  *     src/square.ts:53-54);
  *   - field projection → `SupportsPushDownRequiredColumns`: the page
  *     parser materializes only requested columns;
  *   - page buffering → one `InputPartition` per page, parsed on
  *     EXECUTORS in parallel (the reference accumulates every page in
  *     driver memory; src/square.ts:47,84);
  *   - 429 backoff → [[PageFetcher]] retry slot, bounded exponential
  *     backoff (src/square.ts:69-73), testable without a network.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.dsv2.PagedJsonSource")
  *     .schema(schema).option("path", dir).load()
  * }}}
  */
object PagedJsonSource {
  /** Test observability: pages planned by the most recent scan. */
  @volatile var lastPlannedPages: Int = -1

  private[dsv2] def isHttp(path: String): Boolean =
    path.startsWith("http://") || path.startsWith("https://")

  /** Fetcher for a path: HTTP (with forwarded headers) or local file,
    * both wrapped in the bounded-backoff retry slot. */
  private[dsv2] def fetcherFor(path: String, headers: Map[String, String]): PageFetcher =
    new RetryingFetcher(
      if (isHttp(path)) new HttpPageFetcher(headers) else new LocalFileFetcher)

  /** Manifest lines for a feed dir (HTTP or local), blank lines dropped —
    * an appended manifest with a stray empty line must not break either
    * the batch or the streaming path. */
  private[dsv2] def manifestLines(dir: String, headers: Map[String, String]): Seq[String] =
    (if (isHttp(dir)) fetcherFor(dir, headers).open(s"$dir/manifest.jsonl").toSeq
    else java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "manifest.jsonl")).asScala.toSeq)
      .filter(_.trim.nonEmpty)

  /** `header.`-prefixed table options become HTTP request headers (e.g.
    * `option("header.Authorization", "Bearer ...")` — the analog of the
    * reference's bearer-token header, src/square.ts:62-66). */
  private[dsv2] def headerOptions(props: java.util.Map[String, String]): Map[String, String] =
    props.asScala.collect {
      case (k, v) if k.toLowerCase(java.util.Locale.ROOT).startsWith("header.") =>
        k.substring("header.".length) -> v
    }.toMap
}

class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.model.SquareSchemas.payment // default entity; pass .schema(...) to override

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable(properties.get("path"), schema,
      PagedJsonSource.headerOptions(properties))

  override def supportsExternalMetadata(): Boolean = true
}

final class PagedTable(
    dir: String,
    schema: StructType,
    headers: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"paged-json `$dir`"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(dir, schema, headers)
}

final class PagedScanBuilder(
    dir: String,
    fullSchema: StructType,
    headers: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var minBound: Option[String] = None // inclusive lower created_at
  private var maxBound: Option[String] = None // inclusive upper created_at
  private var limit: Option[Int] = None

  /** Limit pushdown: with per-page row counts in the manifest, planning
    * stops adding pages once the cumulative count covers the limit.
    * Partial push — Spark re-applies the exact limit on top. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed: Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = mutable.ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ GreaterThanOrEqual("created_at", v: String) =>
        minBound = Some(minBound.fold(v)(b => if (v > b) v else b)); accepted += f
      case f @ GreaterThan("created_at", v: String) =>
        minBound = Some(minBound.fold(v)(b => if (v > b) v else b)); accepted += f
      case f @ LessThanOrEqual("created_at", v: String) =>
        maxBound = Some(maxBound.fold(v)(b => if (v < b) v else b)); accepted += f
      case f @ LessThan("created_at", v: String) =>
        maxBound = Some(maxBound.fold(v)(b => if (v < b) v else b)); accepted += f
      case _ => ()
    }
    pushed = accepted.toArray
    // Page pruning is range-granular, not row-exact → every filter stays
    // residual for Spark to re-apply (same contract as parquet row groups).
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new PagedScan(dir, required, minBound, maxBound, limit, headers)
}

final case class PagePartition(file: String) extends InputPartition

final class PagedScan(
    dir: String,
    requiredSchema: StructType,
    minBound: Option[String],
    maxBound: Option[String],
    limit: Option[Int] = None,
    headers: Map[String, String] = Map.empty) extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedJsonScan dir=$dir bounds=[${minBound.getOrElse("-inf")}, ${maxBound.getOrElse("+inf")}]"

  /** Driver-side planning: read the manifest, keep pages whose
    * [min_created_at, max_created_at] range intersects the pushed bounds
    * — pages outside the incremental window are never fetched at all.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val mapper = new ObjectMapper()
    // The manifest travels the same fetcher path as the pages, so an
    // HTTP feed's manifest gets the identical retry/429/auth handling.
    val manifest = PagedJsonSource.manifestLines(dir, headers)
    val inWindow = manifest.flatMap { line =>
      val n = mapper.readTree(line)
      val file = n.get("file").asText()
      val pageMin = n.get("min_created_at").asText()
      val pageMax = n.get("max_created_at").asText()
      val rows = Option(n.get("rows")).map(_.asLong())
      val overlaps =
        minBound.forall(b => pageMax >= b) && maxBound.forall(b => pageMin <= b)
      if (overlaps) Some((PagePartition(s"$dir/$file"), rows)) else None
    }
    // limit pushdown: stop once known page row counts cover the limit
    // (only when every kept page declares rows; unknown counts disable it)
    val kept: Seq[InputPartition] = limit match {
      case Some(l) if inWindow.nonEmpty && inWindow.forall(_._2.isDefined) =>
        var cum = 0L
        val buf = mutable.ArrayBuffer.empty[InputPartition]
        val it = inWindow.iterator
        while (cum < l && it.hasNext) {
          val (p, r) = it.next(); buf += p; cum += r.get
        }
        buf.toSeq
      case _ => inWindow.map(_._1).toSeq
    }
    PagedJsonSource.lastPlannedPages = kept.size
    kept.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(requiredSchema, headers)

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PagedMicroBatchStream(dir, requiredSchema, minBound, maxBound, headers)
}

/** Streaming offset = number of manifest pages consumed. The feed is
  * append-only (new pages land at the manifest tail — the incremental
  * analog of the reference's cursor advancing), so a page index is a
  * complete, replayable position. */
final case class PageOffset(pages: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = s"""{"pages":$pages}"""
}

/** Micro-batch stream over the paged feed: each batch covers the
  * manifest lines appended since the last committed offset, one input
  * partition per page (parsed on executors, same reader as the batch
  * path). Pages whose created_at range misses the pushed time window are
  * planned away but still advance the offset — pruning never stalls
  * progress. Exactly-once comes from Structured Streaming's offset log:
  * a replayed batch re-reads the same page range.
  */
final class PagedMicroBatchStream(
    dir: String,
    requiredSchema: StructType,
    minBound: Option[String],
    maxBound: Option[String],
    headers: Map[String, String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val mapper = new ObjectMapper()

  private def manifestLines(): Seq[String] =
    PagedJsonSource.manifestLines(dir, headers)

  override def initialOffset(): Offset = PageOffset(0)
  override def latestOffset(): Offset = PageOffset(manifestLines().size)
  override def deserializeOffset(json: String): Offset =
    PageOffset(mapper.readTree(json).get("pages").asInt())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[PageOffset].pages
    val to = end.asInstanceOf[PageOffset].pages
    manifestLines().slice(from, to).flatMap { line =>
      val n = mapper.readTree(line)
      val overlaps =
        minBound.forall(b => n.get("max_created_at").asText() >= b) &&
          maxBound.forall(b => n.get("min_created_at").asText() <= b)
      if (overlaps) Some(PagePartition(s"$dir/${n.get("file").asText()}"))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(requiredSchema, headers)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Executor-side page fetch slot. `open` is one "HTTP page request";
  * [[RetryingFetcher]] adds the bounded-backoff retry the reference
  * hardcodes as a 10s sleep on 429. [[HttpPageFetcher]] is the
  * production implementation; [[LocalFileFetcher]] serves file feeds
  * and tests. */
trait PageFetcher extends Serializable {
  def open(file: String): Iterator[String]
}

final class LocalFileFetcher extends PageFetcher {
  def open(file: String): Iterator[String] =
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(file)).asScala.iterator
}

/** Bounded retry around a fetcher, with the reference's failure split
  * (src/square.ts:69-80): 429 → wait (server's Retry-After when given,
  * else exponential backoff) and re-request; transport IOExceptions →
  * exponential backoff; any other HTTP failure (PageFetchFailedException
  * is not an IOException) → fail fast, no retry.
  *
  * Every sleep — including a server-supplied Retry-After — is capped at
  * `maxWaitMs`: a buggy or hostile server sending `Retry-After: 86400`
  * must not pin an executor task (or the driver, for manifest/cursor
  * fetches) for a day per attempt. */
final class RetryingFetcher(
    inner: PageFetcher,
    maxAttempts: Int = 5,
    baseBackoffMs: Long = 100,
    maxWaitMs: Long = 60000) extends PageFetcher {
  def open(file: String): Iterator[String] = {
    var attempt = 0
    while (true) {
      try return inner.open(file)
      catch {
        case RateLimitedException(retryAfterMs, _) if attempt < maxAttempts - 1 =>
          attempt += 1
          Thread.sleep(math.min(
            retryAfterMs.getOrElse(baseBackoffMs * (1L << (attempt - 1))), maxWaitMs))
        case _: java.io.IOException if attempt < maxAttempts - 1 =>
          attempt += 1
          Thread.sleep(math.min(baseBackoffMs * (1L << (attempt - 1)), maxWaitMs))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

final class PagedReaderFactory(
    requiredSchema: StructType,
    headers: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PagePartition].file
    new PagedReader(file, requiredSchema,
      PagedJsonSource.fetcherFor(file, headers))
  }
}

/** Parses one page of JSONL into InternalRows for the pruned schema.
  * Supports the entity subset used by the Square schemas: string, long,
  * double, boolean, struct, array<struct>.
  */
final class PagedReader(
    file: String,
    schema: StructType,
    fetcher: PageFetcher) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = fetcher.open(file)
  private var current: InternalRow = _

  private def convert(node: JsonNode, dt: DataType): Any =
    if (node == null || node.isNull) null
    else dt match {
      case StringType  => UTF8String.fromString(node.asText())
      case LongType    => node.asLong()
      case IntegerType => node.asInt()
      case DoubleType  => node.asDouble()
      case BooleanType => node.asBoolean()
      case st: StructType => convertStruct(node, st)
      case ArrayType(et, _) =>
        new GenericArrayData(node.elements().asScala.map(convert(_, et)).toArray)
      case other => throw new UnsupportedOperationException(s"paged-json: $other")
    }

  private def convertStruct(node: JsonNode, st: StructType): InternalRow =
    InternalRow.fromSeq(st.fields.toIndexedSeq.map(f => convert(node.get(f.name), f.dataType)))

  override def next(): Boolean = {
    if (!lines.hasNext) return false
    current = convertStruct(mapper.readTree(lines.next()), schema)
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
