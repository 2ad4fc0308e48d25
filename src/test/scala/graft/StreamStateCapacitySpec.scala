package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** 100×-capacity evidence for stream-stream join state (the e21/e29
  * shape): scaling the state footprint (keys held within the watermark
  * horizon) 10× must grow state rows, on-disk RocksDB state bytes, and
  * drain wall time ~LINEARLY. A super-linear blowup here is the failure
  * mode that only shows up in production key cardinalities — this spec
  * pins the growth curve at test scale so the 100× argument is a
  * measured slope, not a hope. */
class StreamStateCapacitySpec extends SparkSpec {

  private case class Drained(
      stateRows: Long, stateBytes: Long, wallMs: Long, outRows: Long)

  /** e21's topology at `nUsers` keys: per user one matched click→
    * purchase pair plus one never-matched click (held in state until
    * the sentinel advances the watermark past its 6 h horizon). */
  private def drainAt(nUsers: Int): Drained = {
    import spark.implicits._
    val root = Files.createTempDirectory(s"state-cap-$nUsers").toString
    val feed = s"$root/feed"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val base = 1700000000L // fixed epoch seconds: deterministic feed
    val clicks = spark.range(nUsers).select(
      (col("id") * 10 + 1).as("event_id"),
      timestamp_seconds(lit(base) + col("id") % 600).as("ts"),
      col("id").as("user_id"), lit("click").as("event_type"))
    val lateClicks = spark.range(nUsers).select(
      (col("id") * 10 + 2).as("event_id"),
      timestamp_seconds(lit(base) + 7200 + col("id") % 600).as("ts"),
      col("id").as("user_id"), lit("click").as("event_type"))
    val purchases = spark.range(nUsers).select(
      (col("id") * 10 + 3).as("event_id"),
      timestamp_seconds(lit(base) + 1800 + col("id") % 600).as("ts"),
      col("id").as("user_id"), lit("purchase").as("event_type"))
    clicks.unionByName(lateClicks).unionByName(purchases)
      .coalesce(4).write.parquet(feed)

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      var maxStateRows = 0L
      def drain(): Long = {
        def side(tpe: String) = spark.readStream
          .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING")
          .parquet(feed)
          .filter(col("event_type") === tpe)
        val c = side("click")
          .select(col("event_id").as("click_id"), col("ts").as("cts"), col("user_id"))
          .withWatermark("cts", "1 hour")
        val p = side("purchase")
          .select(col("event_id").as("purchase_id"), col("ts").as("pts"),
            col("user_id").as("p_user"))
          .withWatermark("pts", "1 hour")
        val q = c.join(p,
          col("user_id") === col("p_user") &&
            col("pts") >= col("cts") &&
            col("pts") < col("cts") + expr("INTERVAL 6 HOURS"),
          "left_outer")
          .select(col("click_id"), col("purchase_id"), col("user_id"))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        val t0 = System.nanoTime()
        q.awaitTermination()
        q.recentProgress.foreach { pr =>
          pr.stateOperators.foreach(so => maxStateRows = math.max(maxStateRows, so.numRowsTotal))
        }
        (System.nanoTime() - t0) / 1000000
      }
      var wall = drain()
      // sentinel pair far in the future retires every real row's state
      Seq((-1L, base + 40L * 24 * 3600, -1L, "click"),
        (-2L, base + 40L * 24 * 3600, -1L, "purchase"))
        .toDF("event_id", "epoch", "user_id", "event_type")
        .select(col("event_id"), timestamp_seconds(col("epoch")).as("ts"),
          col("user_id"), col("event_type"))
        .coalesce(1).write.mode("append").parquet(feed)
      wall += drain()
      wall += drain() // second advance flushes remaining unmatched state

      val stateBytes = {
        val d = new java.io.File(s"$ckpt/state")
        def size(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles()).getOrElse(Array.empty).map(size).sum
        size(d)
      }
      val outRows = spark.read.parquet(out).filter(col("user_id") >= 0).count()
      Drained(maxStateRows, stateBytes, wall, outRows)
    } finally prevProvider match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  /** transformWithState (e22's topology) at `nUsers` keys: three
    * purchases per user, one milestone crossing each — custom RocksDB
    * value state, one long per user forever. */
  private def drainCustomState(nUsers: Int): Drained = {
    import spark.implicits._
    import graft.streaming.Milestones
    val root = Files.createTempDirectory(s"tws-cap-$nUsers").toString
    val feed = s"$root/feed"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val purchases = (1 to 3).map { i =>
      spark.range(nUsers).select(
        col("id").as("user_id"),
        (col("id") * 10 + i).as("event_id"),
        (lit(1700000000000000L) + col("id") + i * 1000000L).as("ts_us"),
        lit(5000L).as("cents"))
    }.reduce(_ unionByName _)
    purchases.coalesce(4).write.parquet(feed)

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("user_id BIGINT, event_id BIGINT, ts_us BIGINT, cents BIGINT")
        .parquet(feed)
        .as[Milestones.Purchase]
      val q = stream.groupByKey(_.user_id)
        .transformWithState(
          new Milestones.SpendMilestones(stepCents = 10000L),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      val t0 = System.nanoTime()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1000000
      var stateRows = 0L
      q.recentProgress.foreach(
        _.stateOperators.foreach(so => stateRows = math.max(stateRows, so.numRowsTotal)))
      val stateBytes = {
        def size(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles()).getOrElse(Array.empty).map(size).sum
        size(new java.io.File(s"$ckpt/state"))
      }
      Drained(stateRows, stateBytes, wall, spark.read.parquet(out).count())
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("2k/20k/200k keys: custom transformWithState RocksDB state ~linear (three-point fit)") {
    val pts = Seq(2000, 20000, 200000).map(n => n -> drainCustomState(n))
    pts.foreach { case (n, d) =>
      info(f"$n%6d keys: stateRows=${d.stateRows} stateBytes=${d.stateBytes} wallMs=${d.wallMs} out=${d.outRows}")
    }
    val Seq((_, p1), (_, p10), (_, p100)) = pts
    // exactly one crossing and one state row per user at every scale
    assert(p1.outRows === 2000L && p10.outRows === 20000L && p100.outRows === 200000L)
    assert(p1.stateRows === 2000L && p10.stateRows === 20000L && p100.stateRows === 200000L)
    // per-hop bounds (slack for per-store fixed overhead at the small point)
    assert(p10.stateBytes <= 20L * p1.stateBytes && p100.stateBytes <= 20L * p10.stateBytes,
      s"state bytes super-linear: ${pts.map(_._2.stateBytes).mkString(" -> ")}")
    assert(p10.wallMs <= 25L * p1.wallMs && p100.wallMs <= 25L * p10.wallMs,
      s"drain time super-linear: ${pts.map(_._2.wallMs).mkString(" -> ")} ms")
    // the three-point FIT: marginal cost per key must stop growing once
    // fixed overhead amortizes — the 10x→100x per-key slopes are the
    // linearity evidence the 1x→10x hop alone can't give
    val bytesPerKey10 = p10.stateBytes.toDouble / 20000
    val bytesPerKey100 = p100.stateBytes.toDouble / 200000
    assert(bytesPerKey100 <= 2.0 * bytesPerKey10,
      f"per-key state bytes still growing at 100x: $bytesPerKey10%.1f -> $bytesPerKey100%.1f")
    val wallPerKey10 = p10.wallMs.toDouble / 20000
    val wallPerKey100 = p100.wallMs.toDouble / 200000
    assert(wallPerKey100 <= 3.0 * wallPerKey10,
      f"per-key drain time still growing at 100x: $wallPerKey10%.3f -> $wallPerKey100%.3f ms")
  }

  test("2k/20k/200k keys: join state rows, RocksDB bytes, drain time ~linear (three-point fit)") {
    val pts = Seq(2000, 20000, 200000).map(n => n -> drainAt(n))
    pts.foreach { case (n, d) =>
      info(f"$n%6d keys: stateRows=${d.stateRows} stateBytes=${d.stateBytes} wallMs=${d.wallMs} out=${d.outRows}")
    }
    val Seq((_, p1), (_, p10), (_, p100)) = pts
    // correctness at every scale: matched pair + null-extended late click per user
    assert(p1.outRows === 4000L && p10.outRows === 40000L && p100.outRows === 400000L)
    // state rows track keys (slack for watermark bookkeeping)
    assert(p1.stateRows > 0)
    assert(p10.stateRows <= 12L * p1.stateRows && p100.stateRows <= 12L * p10.stateRows,
      s"state rows super-linear: ${pts.map(_._2.stateRows).mkString(" -> ")}")
    assert(p10.stateBytes <= 20L * p1.stateBytes && p100.stateBytes <= 20L * p10.stateBytes,
      s"state bytes super-linear: ${pts.map(_._2.stateBytes).mkString(" -> ")}")
    assert(p10.wallMs <= 25L * p1.wallMs && p100.wallMs <= 25L * p10.wallMs,
      s"drain time super-linear: ${pts.map(_._2.wallMs).mkString(" -> ")} ms")
    // three-point fit: per-key marginals must flatten by the 100x point
    val bytesPerKey10 = p10.stateBytes.toDouble / 20000
    val bytesPerKey100 = p100.stateBytes.toDouble / 200000
    assert(bytesPerKey100 <= 2.0 * bytesPerKey10,
      f"per-key state bytes still growing at 100x: $bytesPerKey10%.1f -> $bytesPerKey100%.1f")
    val wallPerKey10 = p10.wallMs.toDouble / 20000
    val wallPerKey100 = p100.wallMs.toDouble / 200000
    assert(wallPerKey100 <= 3.0 * wallPerKey10,
      f"per-key drain time still growing at 100x: $wallPerKey10%.3f -> $wallPerKey100%.3f ms")
  }
}
