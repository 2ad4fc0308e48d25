package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.plans.AsOfJoinNative

/** Native (LogicalPlan+Strategy+Exec) as-of join must agree exactly with
  * the composed union+window operator, and plan as one merge with two
  * exchanges.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("native == composed on hand-built edge cases") {
    val left = Seq(
      (1L, ts(10), "L-a"), (1L, ts(30), "L-b"), (1L, ts(5), "L-early"),
      (2L, ts(20), "L-c"), (3L, ts(50), "L-nokey"))
      .toDF("k", "lts", "lval")
    val right = Seq(
      (1L, ts(10), "R1"), (1L, ts(25), "R2"), (2L, ts(5), "R3"), (9L, ts(1), "R-unused"))
      .toDF("rk", "rts", "rval")
    val native = AsOfJoinNative.asofJoin(left, right, "k", "rk", "lts", "rts")
      .select("lval", "rval").as[(String, String)].collect().toMap
    assert(native("L-a") === "R1")      // inclusive tie
    assert(native("L-b") === "R2")
    assert(native("L-early") === null)
    assert(native("L-c") === "R3")
    assert(native("L-nokey") === null)
  }

  test("forward direction: earliest right at-or-after each left row, per key") {
    val left = Seq(
      (1L, ts(10), "L-tie"),    // equal ts matches (inclusive)
      (1L, ts(11), "L-next"),   // skips the ts(10) row, takes ts(25)
      (1L, ts(26), "L-late"),   // nothing after -> NULL
      (2L, ts(1), "L-share"),   // both 2L rows share the single future row
      (2L, ts(3), "L-share2"),
      (3L, ts(5), "L-nokey"))
      .toDF("k", "lts", "lval")
    val right = Seq(
      (1L, ts(10), "R1"), (1L, ts(25), "R2"), (2L, ts(7), "R3"), (0L, ts(1), "R-unused"))
      .toDF("rk", "rts", "rval")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "rk", "lts", "rts", forward = true)
      .select("lval", "rval").as[(String, String)].collect().toMap
    assert(out("L-tie") === "R1")
    assert(out("L-next") === "R2")
    assert(out("L-late") === null)
    assert(out("L-share") === "R3")   // match must NOT consume the right head:
    assert(out("L-share2") === "R3")  // the same future row answers both lefts
    assert(out("L-nokey") === null)
  }

  test("forward agrees with the batch first-future-row formulation on real events") {
    val ev = Tables.events(spark, sfDir)
    val l = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("lid"), col("user_id"), col("ts").as("lts"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("ru"), col("ts").as("rts"), col("event_id").as("rid"))
    val native = AsOfJoinNative.asofJoin(l, r, "user_id", "ru", "lts", "rts", forward = true)
      .select(col("lid"), col("rid"))
    // oracle formulation: min (rts, rid) struct over future rows per left
    val ref = l.join(r, col("user_id") === col("ru") && col("rts") >= col("lts"), "left_outer")
      .groupBy(col("lid"))
      .agg(min(when(col("rid").isNotNull, struct(col("rts"), col("rid")))).as("m"))
      .select(col("lid"), col("m.rid").as("rid"))
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty)
  }

  test("native == composed on real events at sf0.001 (20k-scale at sf0.1 covered by drive)") {
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val sgn = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("sts"), col("event_id").as("signup_id"))
    val native = AsOfJoinNative.asofJoin(p, sgn, "user_id", "s_user", "pts", "sts")
      .select(col("purchase_id"), col("signup_id"))
    val composedRight = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("sts"), col("event_id").as("signup_id"))
    val composed = AsOfJoin.asofJoin(p, composedRight, "user_id", "pts", "sts")
      .select(col("purchase_id"), col("signup_id"))
    assert(native.count() === p.count()) // left-preserving
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
  }

  test("string keys: matchedKey survives buffer reuse across advanceRight") {
    // Regression: matchedKey used to store a UTF8String VIEW into the
    // reused UnsafeProjection buffer; consuming the next right row (a
    // different key) overwrote it, so later left rows of the same key
    // lost their valid match. Needs a right row of key B to be read
    // between two left rows of key A.
    val left = Seq(
      ("aa", ts(10), "L1"), ("aa", ts(20), "L2"), ("bb", ts(50), "L3"))
      .toDF("k", "lts", "lval")
    val right = Seq(
      ("aa", ts(5), "RA"), ("bb", ts(7), "RB"))
      .toDF("rk", "rts", "rval")
    val out = AsOfJoinNative.asofJoin(left, right, "k", "rk", "lts", "rts")
      .select("lval", "rval").as[(String, String)].collect().toMap
    assert(out === Map("L1" -> "RA", "L2" -> "RA", "L3" -> "RB"))
  }

  test("unmatched left rows get NULL (not 0/false) for non-nullable right columns") {
    val left = Seq((1L, ts(10), "hit"), (2L, ts(10), "miss")).toDF("k", "lts", "lval")
    val right = Seq((1L, ts(5), 42L, true)).toDF("rk", "rts", "rnum", "rflag")
    val rows = AsOfJoinNative.asofJoin(left, right, "k", "rk", "lts", "rts")
      .select("lval", "rnum", "rflag").collect()
    val byVal = rows.map(r => r.getString(0) -> r).toMap
    assert(byVal("hit").getLong(1) === 42L && byVal("hit").getBoolean(2) === true)
    assert(byVal("miss").isNullAt(1), "unmatched long must be NULL, not 0")
    assert(byVal("miss").isNullAt(2), "unmatched boolean must be NULL, not false")
  }

  test("plans as AsOfJoinExec with hash exchanges and in-partition sorts") {
    val left = Seq((1L, ts(1), "x")).toDF("k", "lts", "v")
    val right = Seq((1L, ts(0), "y")).toDF("rk", "rts", "w")
    val df = AsOfJoinNative.asofJoin(left, right, "k", "rk", "lts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2)
    assert(plan.contains("Sort "), "children must be sorted by (key, ts)")
    assert(df.count() === 1)
  }

  test("repartition-stability of the native operator") {
    val left = (1 to 300).map(i => (i % 5L, ts(i), s"L$i")).toDF("k", "lts", "v")
    val right = (1 to 90).map(i => (i % 5L, ts(i * 3), s"R$i")).toDF("rk", "rts", "w")
    val a = AsOfJoinNative.asofJoin(left.repartition(11), right.repartition(2), "k", "rk", "lts", "rts")
    val b = AsOfJoinNative.asofJoin(left.coalesce(1), right.coalesce(1), "k", "rk", "lts", "rts")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    assert(a.count() === 300)
  }
}
