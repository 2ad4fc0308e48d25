package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.model.SquareSchemas

/** DSv2 paged source: planning-time page pruning from pushed time-window
  * filters, column pruning, executor-side parsing, retry slot.
  */
class PagedSourceSpec extends SparkSpec {

  /** Three pages with disjoint created_at ranges + a manifest. */
  private lazy val feedDir: String = {
    val dir = Files.createTempDirectory("paged-feed").toString
    def page(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes)
    page("page-0.jsonl", Seq(
      """{"id":"p1","created_at":"2024-01-05T00:00:00Z","total_money":{"amount":100,"currency":"USD"}}""",
      """{"id":"p2","created_at":"2024-01-10T00:00:00Z","amount_money":{"amount":200,"currency":"USD"}}"""))
    page("page-1.jsonl", Seq(
      """{"id":"p3","created_at":"2024-02-05T00:00:00Z","total_money":{"amount":300,"currency":"USD"}}""",
      """{"id":"p4","created_at":"2024-02-10T00:00:00Z","total_money":{"amount":400,"currency":"USD"}}"""))
    page("page-2.jsonl", Seq(
      """{"id":"p5","created_at":"2024-03-05T00:00:00Z","total_money":{"amount":500,"currency":"USD"}}"""))
    Files.write(Paths.get(dir, "manifest.jsonl"), Seq(
      """{"file":"page-0.jsonl","min_created_at":"2024-01-05T00:00:00Z","max_created_at":"2024-01-10T00:00:00Z","rows":2}""",
      """{"file":"page-1.jsonl","min_created_at":"2024-02-05T00:00:00Z","max_created_at":"2024-02-10T00:00:00Z","rows":2}""",
      """{"file":"page-2.jsonl","min_created_at":"2024-03-05T00:00:00Z","max_created_at":"2024-03-05T00:00:00Z","rows":1}"""
    ).mkString("\n").getBytes)
    dir
  }

  private def read() = spark.read
    .format("graft.sources.dsv2.PagedJsonSource")
    .schema(SquareSchemas.payment)
    .option("path", feedDir)
    .load()

  test("full scan reads every page; nested money structs parse") {
    val df = read()
    assert(df.count() === 5)
    val p1 = df.filter(col("id") === "p1").select(col("total_money.amount")).head().getLong(0)
    assert(p1 === 100L)
    assert(df.rdd.getNumPartitions === 3) // one partition per page
  }

  test("time-window filter prunes pages at planning time") {
    val df = read().filter(
      col("created_at") >= "2024-02-01T00:00:00Z" && col("created_at") < "2024-03-01T00:00:00Z")
    // only page-1 overlaps the window → one input partition
    assert(df.rdd.getNumPartitions === 1)
    assert(df.select("id").orderBy("id").collect().map(_.getString(0)).toSeq === Seq("p3", "p4"))
    // and the pushed bounds are visible in the scan description
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PagedJsonScan") || scanDesc.contains("BatchScan"))
  }

  test("residual filtering stays row-exact within a kept page") {
    // window covers only the first row of page-0: page kept, second row filtered
    val df = read().filter(col("created_at") <= "2024-01-05T00:00:00Z")
    assert(df.rdd.getNumPartitions === 1)
    assert(df.select("id").collect().map(_.getString(0)).toSeq === Seq("p1"))
  }

  test("column pruning reaches the reader schema") {
    val df = read().select("id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(df.columns.toSeq === Seq("id"))
    assert(df.count() === 5)
  }

  test("limit pushdown stops planning pages once counts cover the limit") {
    import graft.sources.dsv2.PagedJsonSource
    assert(read().limit(2).collect().length === 2)
    assert(PagedJsonSource.lastPlannedPages === 1, "2 rows fit in page-0 alone")
    assert(read().limit(3).collect().length === 3)
    assert(PagedJsonSource.lastPlannedPages === 2)
    // limit larger than the feed keeps everything and returns all rows
    assert(read().limit(100).collect().length === 5)
    assert(PagedJsonSource.lastPlannedPages === 3)
  }

  test("retry slot: transient failures recover with backoff") {
    import graft.sources.dsv2.{PageFetcher, RetryingFetcher}
    var calls = 0
    val flaky = new PageFetcher {
      def open(file: String): Iterator[String] = {
        calls += 1
        if (calls < 3) throw new java.io.IOException("simulated 429")
        Iterator("""{"ok":true}""")
      }
    }
    val out = new RetryingFetcher(flaky, maxAttempts = 5, baseBackoffMs = 1).open("x").toSeq
    assert(out === Seq("""{"ok":true}"""))
    assert(calls === 3)
    // permanent failure surfaces after maxAttempts
    val dead = new PageFetcher {
      def open(file: String): Iterator[String] = throw new java.io.IOException("down")
    }
    intercept[java.io.IOException] {
      new RetryingFetcher(dead, maxAttempts = 2, baseBackoffMs = 1).open("x")
    }
  }

  test("DSv2 feed composes with the payments pipeline transform") {
    val rows = graft.operators.SquareOps.payments(read(), graft.model.Tenant())
    assert(rows.count() === 5)
    assert(rows.filter(col("amount") === 200L).count() === 1) // amount_money fallback
  }
}
