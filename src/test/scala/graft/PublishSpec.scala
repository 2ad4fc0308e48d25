package graft

import java.nio.file.Files
import graft.operators.Publish

/** Multi-table atomic publish: all-or-nothing visibility, crash windows,
  * retry idempotence, time travel, expiry.
  */
class PublishSpec extends SparkSpec {
  import spark.implicits._

  private def root() = Files.createTempDirectory("publish").toString + "/pub"

  test("both tables appear together and read back exactly") {
    val r = root()
    val run = Publish.publish(spark, r, Map(
      "a" -> Seq((1L, "x"), (2L, "y")).toDF("k", "v"),
      "b" -> Seq((10L, 1.5)).toDF("k", "w")))
    assert(run === 1L)
    assert(Publish.latestCommitted(spark, r) === 1L)
    assert(Publish.read(spark, r, "a").count() === 2)
    assert(Publish.read(spark, r, "b").as[(Long, Double)].head() === ((10L, 1.5)))
  }

  test("a staged-but-uncommitted run is invisible for EVERY table (crash window)") {
    val r = root()
    Publish.publish(spark, r, Map(
      "a" -> Seq((1L, "old")).toDF("k", "v"),
      "b" -> Seq((1L, "old")).toDF("k", "v")))
    // crash: run 2 fully staged, marker never written
    val staged = Publish.stageRun(spark, r, Map(
      "a" -> Seq((1L, "new")).toDF("k", "v"),
      "b" -> Seq((1L, "new")).toDF("k", "v")))
    assert(staged === 2L)
    assert(Publish.latestCommitted(spark, r) === 1L)
    assert(Publish.read(spark, r, "a").select("v").as[String].head() === "old")
    assert(Publish.read(spark, r, "b").select("v").as[String].head() === "old")
    // retry allocates a FRESH id (ids are never reused — the orphan
    // stage stays invisible until expire), then commits — both flip
    val retried = Publish.stageRun(spark, r, Map(
      "a" -> Seq((1L, "new")).toDF("k", "v"),
      "b" -> Seq((1L, "new")).toDF("k", "v")))
    assert(retried === 3L)
    Publish.commitRun(spark, r, retried)
    assert(Publish.read(spark, r, "a").select("v").as[String].head() === "new")
    assert(Publish.read(spark, r, "b").select("v").as[String].head() === "new")
  }

  test("two concurrent publishers both land durably with linearized run ids") {
    val r = root()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(Publish.publish(spark, r, Map("t" -> Seq(Tuple1("A")).toDF("who"))))
    val fb = Future(Publish.publish(spark, r, Map("t" -> Seq(Tuple1("B")).toDF("who"))))
    val ra = Await.result(fa, 120.seconds)
    val rb = Await.result(fb, 120.seconds)
    // the CAS reservation forbids a shared id: both runs durable, ordered
    assert(Set(ra, rb) === Set(1L, 2L))
    assert(Publish.latestCommitted(spark, r) === 2L)
    val seen = Seq(1L, 2L).map(run =>
      Publish.read(spark, r, "t", run).select("who").as[String].head())
    assert(seen.toSet === Set("A", "B"))
  }

  test("double-commit of one run fails loudly (second committer loses)") {
    val r = root()
    val run = Publish.publish(spark, r, Map("a" -> Seq(Tuple1(1L)).toDF("k")))
    intercept[Exception] { Publish.commitRun(spark, r, run) }
  }

  test("WAP: a failing audit never becomes visible; the orphan expires") {
    val r = root()
    def auditMinRows(n: Long)(staged: Map[String, org.apache.spark.sql.DataFrame]) =
      staged.values.forall(_.count() >= n)
    // clean run commits
    val ok = Publish.publishAudited(spark, r,
      Map("t" -> Seq((1L, "a"), (2L, "b")).toDF("k", "v")))(auditMinRows(2))
    assert(ok === Some(1L))
    // the audit sees the STAGED bytes: a run refused by the audit stays
    // fully staged on disk but invisible — latest and reads untouched
    val refused = Publish.publishAudited(spark, r,
      Map("t" -> Seq((9L, "bad")).toDF("k", "v")))(auditMinRows(2))
    assert(refused === None)
    assert(Publish.latestCommitted(spark, r) === 1L)
    assert(Publish.read(spark, r, "t").count() === 2)
    // the refused orphan occupies run id 2; the next publisher skips it
    val next = Publish.publishAudited(spark, r,
      Map("t" -> Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")))(auditMinRows(2))
    assert(next === Some(3L))
    // expire reclaims the refused stage along with old runs
    Publish.expire(spark, r, keepLast = 1)
    intercept[Exception] { Publish.read(spark, r, "t", run = 1).collect() }
    assert(Publish.read(spark, r, "t").count() === 3)
  }

  test("time travel by run id; expire keeps the retained window readable") {
    val r = root()
    (1 to 4).foreach { i =>
      Publish.publish(spark, r, Map("a" -> Seq(Tuple1(i.toLong)).toDF("k")))
    }
    assert(Publish.read(spark, r, "a", run = 2).as[Long].head() === 2L)
    Publish.expire(spark, r, keepLast = 2)
    assert(Publish.read(spark, r, "a", run = 4).as[Long].head() === 4L)
    assert(Publish.read(spark, r, "a", run = 3).as[Long].head() === 3L)
    intercept[Exception] { Publish.read(spark, r, "a", run = 1).collect() }
  }
}
