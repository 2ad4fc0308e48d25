package graft

import java.sql.Timestamp
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

/** Structured Streaming coverage: streaming results must equal their
  * batch equivalents, and the streaming upsert sink must be idempotent
  * across micro-batches.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000)

  test("streaming windowed counts == batch groupBy on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(0), 1, "view", 10.0), Event(2, ts(10), 1, "view", 5.0),
      Event(3, ts(61), 2, "buy", 20.0), Event(4, ts(65), 1, "view", 1.5),
      Event(5, ts(130), 2, "buy", 2.25))
    input.addData(events: _*)
    val q = EventStreams.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("wc").orderBy("hour", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    val exp = events.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"))
      .select(col("window.start"), col("event_type"), col("n"), col("total_value"))
      .orderBy("start", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    assert(got === exp)
    assert(got.map(_._3).sum === events.size)
  }

  test("stateful sessionization emits gap-closed sessions, matches session_window batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // user 1: two sessions (gap 45min between m10 and m55); user 2: one session
    val batch1 = Seq(
      Event(1, ts(0), 1, "view", 1.0), Event(2, ts(10), 1, "view", 2.0),
      Event(3, ts(5), 2, "buy", 3.0))
    val batch2 = Seq(
      Event(4, ts(55), 1, "view", 4.0),
      // far-future event pushes the watermark past every earlier session
      Event(99, ts(10000), 9, "tick", 0.0))
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      // one more empty-ish batch so timeout for the last sessions fires
      input.addData(Event(100, ts(20000), 9, "tick", 0.0)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess").as[Session].collect()
      .map(s => (s.user_id, s.sess_start, s.sess_end, s.n_events, s.total_value)).toSet
    // sessions closed by watermark: user1 [m0,m10] (2 ev, 3.0), user1 [m55,m55]
    // (1 ev, 4.0), user2 [m5,m5] (1 ev, 3.0), user9 [m10000] closed by m20000
    assert(got.contains((1L, ts(0), ts(10), 2L, 3.0)))
    assert(got.contains((1L, ts(55), ts(55), 1L, 4.0)))
    assert(got.contains((2L, ts(5), ts(5), 1L, 3.0)))
    // batch equivalence via session_window over the same closed range
    val all = (batch1 ++ batch2.take(1)).toDF()
    val exp = all.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"), count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("user_id"), col("s"), col("e"), col("n"), col("v"))
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(exp.subsetOf(got.map(t => (t._1, t._2, t._3, t._4, t._5))))
  }

  test("dedupWithinWatermark drops re-delivered ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupWithinWatermark(input.toDF(), "event_id", "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      // batch 2 re-delivers event 1 (at-least-once source) + a new event
      input.addData(Event(1, ts(0), 1, "view", 1.0), Event(3, ts(2), 1, "view", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("runIncremental: each invocation processes only newly-arrived files") {
    import org.apache.spark.sql.types._
    val feed = Files.createTempDirectory("incr-feed").toString
    val table = Files.createTempDirectory("incr-table").toString + "/t"
    val ckpt = Files.createTempDirectory("incr-ckpt").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ver", LongType), StructField("v", StringType)))
    def drop(name: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("k", "ver", "v").coalesce(1).write.parquet(s"$feed/$name")
    // run 1: initial batch
    drop("b1", Seq((1L, 1L, "a1"), (2L, 1L, "b1")))
    EventStreams.runIncremental(spark, feed + "/*", schema, table, Seq("k"), "ver", ckpt)
    assert(spark.read.parquet(table).count() === 2)
    // run 2: only the new file is consumed (checkpoint remembers b1);
    // key 1 re-delivered with a newer version + new key 3
    drop("b2", Seq((1L, 2L, "a2"), (3L, 1L, "c1")))
    EventStreams.runIncremental(spark, feed + "/*", schema, table, Seq("k"), "ver", ckpt)
    val out = spark.read.parquet(table).orderBy("k").as[(Long, Long, String)].collect().toSeq
    assert(out === Seq((1L, 2L, "a2"), (2L, 1L, "b1"), (3L, 1L, "c1")))
    // run 3: nothing new — table unchanged
    EventStreams.runIncremental(spark, feed + "/*", schema, table, Seq("k"), "ver", ckpt)
    assert(spark.read.parquet(table).orderBy("k").as[(Long, Long, String)].collect().toSeq === out)
  }

  test("stream-stream interval join == batch interval join (view→buy attribution)") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val viewRows = Seq(
      Event(1, ts(0), 1, "view", 0), Event(2, ts(5), 2, "view", 0),
      Event(3, ts(40), 1, "view", 0))
    val buyRows = Seq(
      Event(10, ts(8), 1, "buy", 9.5),   // within 10m of view 1
      Event(11, ts(30), 2, "buy", 3.0),  // too late for view 2
      Event(12, ts(44), 1, "buy", 7.0))  // within 10m of view 3 (not view 1)
    val joined = EventStreams.intervalJoin(views.toDF(), buys.toDF(), "user_id")
      .select(col("l_event_id"), col("r_event_id"))
    val q = joined.writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      views.addData(viewRows: _*)
      buys.addData(buyRows: _*)
      q.processAllAvailable()
      // advance both watermarks so buffered pairs flush
      views.addData(Event(99, ts(600), 9, "view", 0))
      buys.addData(Event(98, ts(600), 9, "buy", 0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ij").as[(Long, Long)].collect().toSet - ((99L, 98L))
    assert(got === Set((1L, 10L), (3L, 12L)),
      "attribution pairs only within the interval, per user")
  }

  test("transformWithState milestones: state persists across drains, two-phase == one-shot") {
    import graft.streaming.Milestones
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("tws-milestones").toString
      val feed = s"$root/feed"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
      // user 7: four purchases of 60.00 → crossings at 120.00 (id 2) and
      // 240.00 (id 4); user 8: one 250.00 purchase → one crossing at id 5.
      val rows = Seq(
        (7L, 1L, 1000L, 6000L), (7L, 2L, 2000L, 6000L),   // phase 1
        (8L, 5L, 1500L, 25000L),                          // phase 1
        (7L, 3L, 3000L, 6000L), (7L, 4L, 4000L, 6000L))   // phase 2
      def drain(part: Seq[(Long, Long, Long, Long)], mode: String): Unit = {
        spark.createDataFrame(part).toDF("user_id", "event_id", "ts_us", "cents")
          .write.mode(mode).parquet(feed)
        val q = spark.readStream
          .schema("user_id BIGINT, event_id BIGINT, ts_us BIGINT, cents BIGINT")
          .parquet(feed)
          .as[Milestones.Purchase]
          .groupByKey(_.user_id)
          .transformWithState(
            new Milestones.SpendMilestones(stepCents = 10000L),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain(rows.take(3), "overwrite")
      drain(rows.drop(3), "append")   // state must resume at 120.00 for user 7
      val got = spark.read.parquet(out)
        .select("user_id", "event_id", "cum_cents", "milestone")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === Set(
        (7L, 2L, 12000L, 1L),   // phase-1 crossing
        (8L, 5L, 25000L, 2L),   // single large purchase skips a level
        (7L, 4L, 24000L, 2L)),  // phase-2 crossing needs phase-1 state
        s"unexpected crossings: $got")
    } finally spark.conf.set(providerKey, prevProvider)
  }

  test("transformWithState MapState: per-type counters resume across drains") {
    import graft.streaming.Milestones
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("tws-mapstate").toString
      val feed = s"$root/feed"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
      def drain(part: Seq[(Long, Long, Long, String)], mode: String): Unit = {
        spark.createDataFrame(part).toDF("user_id", "event_id", "ts_us", "event_type")
          .write.mode(mode).parquet(feed)
        val q = spark.readStream
          .schema("user_id BIGINT, event_id BIGINT, ts_us BIGINT, event_type STRING")
          .parquet(feed)
          .as[Milestones.TypedEvent]
          .groupByKey(_.user_id)
          .transformWithState(
            new Milestones.TypeCounters,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // phase 1: a,a,b → emits at counts 1 and 2 for 'a', 1 for 'b'
      drain(Seq((7L, 1L, 1000L, "a"), (7L, 2L, 2000L, "a"), (7L, 3L, 3000L, "b")),
        "overwrite")
      // phase 2: a,a → counts 3 (silent) and 4 (power of two) — the 4
      // only happens if the per-type map resumed at a→2 from phase 1
      drain(Seq((7L, 4L, 4000L, "a"), (7L, 5L, 5000L, "a")), "append")
      val got = spark.read.parquet(out)
        .select("user_id", "event_id", "event_type", "n")
        .as[(Long, Long, String, Long)].collect().toSet
      assert(got === Set(
        (7L, 1L, "a", 1L), (7L, 2L, "a", 2L), (7L, 3L, "b", 1L),
        (7L, 5L, "a", 4L)),
        s"unexpected type milestones: $got")
    } finally spark.conf.set(providerKey, prevProvider)
  }

  test("transformWithState ListState: trailing-3 window resumes across drains") {
    import graft.streaming.Milestones
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("tws-liststate").toString
      val feed = s"$root/feed"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
      def drain(part: Seq[(Long, Long, Long, Long)], mode: String): Unit = {
        spark.createDataFrame(part).toDF("user_id", "event_id", "ts_us", "cents")
          .write.mode(mode).parquet(feed)
        val q = spark.readStream
          .schema("user_id BIGINT, event_id BIGINT, ts_us BIGINT, cents BIGINT")
          .parquet(feed)
          .as[Milestones.Purchase]
          .groupByKey(_.user_id)
          .transformWithState(
            new Milestones.TrailingSpend,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain(Seq((9L, 1L, 1000L, 100L), (9L, 2L, 2000L, 200L), (9L, 3L, 3000L, 300L)),
        "overwrite")
      // the phase-2 window {200,300,400} needs the phase-1 list state
      drain(Seq((9L, 4L, 4000L, 400L)), "append")
      val got = spark.read.parquet(out)
        .select("user_id", "event_id", "cents", "sum3", "n3")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === Set(
        (9L, 1L, 100L, 100L, 1L),
        (9L, 2L, 200L, 300L, 2L),
        (9L, 3L, 300L, 600L, 3L),
        (9L, 4L, 400L, 900L, 3L)),
        s"unexpected trailing windows: $got")
    } finally spark.conf.set(providerKey, prevProvider)
  }

  test("transformWithState timers: watermark-fired inactivity alerts, re-activity disarms") {
    import graft.streaming.Milestones
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("tws-timers").toString
      val feed = s"$root/feed"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
      def t(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      // user 1 active at 0 and 10 (timer re-arms to 40); user 2 only at 0
      // (timer stays at 30). Gap = 30 minutes.
      def drain(rows: Seq[(Long, java.sql.Timestamp)], mode: String): Unit = {
        spark.createDataFrame(rows).toDF("user_id", "ts")
          .write.mode(mode).parquet(feed)
        val q = spark.readStream
          .schema("user_id BIGINT, ts TIMESTAMP")
          .parquet(feed)
          .withWatermark("ts", "0 seconds")
          .as[Milestones.Seen]
          .groupByKey(_.user_id)
          .transformWithState(
            new Milestones.InactivityMonitor(gapMs = 30L * 60000L),
            org.apache.spark.sql.streaming.TimeMode.EventTime(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain(Seq((1L, t(0)), (1L, t(10)), (2L, t(0))), "overwrite")
      // sentinel advances the watermark past both timers; second drain
      // runs a batch UNDER that watermark so the timers fire
      drain(Seq((-1L, t(600))), "append")
      drain(Seq((-1L, t(1200))), "append")
      val got = spark.read.parquet(out)
        .filter($"user_id" >= 0)
        .as[(Long, Long)].collect().toSet
      assert(got === Set(
        (1L, t(10).getTime),   // re-activity moved the alert to last-seen 10
        (2L, t(0).getTime)),
        s"unexpected alerts: $got")
      // expired keys left the store: a fresh event re-registers cleanly
      drain(Seq((2L, t(1300))), "append")
      val after = spark.read.parquet(out).filter($"user_id" >= 0).count()
      assert(after === 2, "no duplicate alert on re-activation within the gap")
    } finally spark.conf.set(providerKey, prevProvider)
  }

  test("streaming upsert sink: duplicate keys across micro-batches collapse to latest") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)] // key, version, value
    val path = Files.createTempDirectory("graft-stream-upsert").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = EventStreams.upsertSink(
      input.toDF().toDF("k", "ver", "v"), path, Seq("k"), "ver", ckpt)
    try {
      input.addData((1L, 1L, "a1"), (2L, 1L, "b1")); q.processAllAvailable()
      // batch 2 re-delivers key 1 (older AND newer version) + new key 3
      input.addData((1L, 3L, "a3"), (1L, 2L, "a2"), (3L, 1L, "c1")); q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(path).orderBy("k")
      .as[(Long, Long, String)].collect().toSeq
    assert(out === Seq((1L, 3L, "a3"), (2L, 1L, "b1"), (3L, 1L, "c1")))
  }
}
