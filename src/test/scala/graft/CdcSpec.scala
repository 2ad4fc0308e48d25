package graft

import graft.operators.Cdc

/** CDC apply: last-wins ordering, deletes, insert-via-update,
  * carry-through, and the snapshot-outranked-by-any-feed-row rule. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

  private def applied(feed: Seq[(Long, String, String, Long)]): Map[Long, String] =
    Cdc(snapshot, feed.toDF("k", "v", "op", "seq"), Seq("k"))
      .as[(Long, String)].collect().toMap

  test("untouched keys carry through unchanged") {
    assert(applied(Nil) === Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("last change per key wins regardless of feed row order") {
    val feed = Seq(
      (1L, "a2", "U", 2L), (1L, "a1", "U", 1L), // out of order on purpose
      (2L, "b9", "U", 9L))
    assert(applied(feed) === Map(1L -> "a2", 2L -> "b9", 3L -> "c"))
  }

  test("delete drops the key; a later re-insert resurrects it") {
    assert(applied(Seq((2L, null, "D", 1L))) === Map(1L -> "a", 3L -> "c"))
    assert(applied(Seq((2L, null, "D", 1L), (2L, "b2", "I", 2L))) ===
      Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("update on an absent key inserts it (upsert semantics)") {
    assert(applied(Seq((9L, "new", "U", 1L))) ===
      Map(1L -> "a", 2L -> "b", 3L -> "c", 9L -> "new"))
  }

  test("snapshot must not already carry op/seq columns") {
    val bad = Seq((1L, "a", "I")).toDF("k", "v", "op")
    intercept[IllegalArgumentException] {
      Cdc(bad, Seq.empty[(Long, String, String, Long)].toDF("k", "v", "op", "seq"), Seq("k"))
    }
  }
}
