package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.operators.Upsert

/** Structured Streaming re-expression of the reference's incremental
  * semantics (SURVEY.md §2.7): the hourly cron + 24h-lookback re-pull +
  * keyed upsert becomes `readStream → event-time transforms with
  * watermark → foreachBatch keyed upsert`. The watermark is the lookback:
  * events later than it are dropped, exactly like records older than the
  * reference's SYNC_LOOKBACK_HOURS window are silently never re-pulled
  * (src/etl-square-payments.ts:12,18-25).
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(
      user_id: Long, sess_start: Timestamp, sess_end: Timestamp,
      n_events: Long, total_value: Double)

  /** Mutable-session accumulator for flatMapGroupsWithState (top-level so
    * a Product encoder exists). */
  final case class SessState(start: Long, last: Long, n: Long, total: Double)

  /** Tumbling hourly counts with a 2h watermark (allowed lateness). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Gap-based sessionization with explicit state —
    * flatMapGroupsWithState over user_id, event-time timeout. A session
    * closes when the watermark passes last_ts + gap. This is the custom-
    * state form; the declarative equivalent is
    * `groupBy(session_window(ts, gap), user)` (used by the batch query
    * e2_sessionization).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[SessState]): Iterator[Session] = {
      var out = List.empty[Session]
      var cur = state.getOption
      if (state.hasTimedOut) {
        cur.foreach { s =>
          out ::= Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
        }
        state.remove()
        cur = None
      }
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs => // inclusive: same rule as session_window
            cur = Some(SessState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
          case Some(s) =>
            out ::= Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
            cur = Some(SessState(t, t, 1, e.value))
          case None =>
            cur = Some(SessState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact dedup: drop re-deliveries of the same id while the
    * event's time is within the watermark — state is bounded by the
    * watermark horizon instead of growing forever (the streaming form of
    * d1 exact dedup; at-least-once sources ⇒ exactly-once rows).
    */
  def dedupWithinWatermark(events: DataFrame, idCol: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCol)

  /** Watermarked stream-stream interval join: pair each left event with
    * right events for the same key whose time falls in
    * [left.ts, left.ts + within]. Both sides carry watermarks and the
    * join condition bounds event time in BOTH directions, so Spark can
    * expire buffered state once the watermark passes the interval — the
    * state-bounded form of attribution joins (view→purchase within N
    * minutes). Columns are returned prefixed `l_`/`r_` to stay
    * unambiguous. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      within: String = "10 minutes",
      lateness: String = "30 minutes"): DataFrame = {
    val l = left.columns.foldLeft(left)((df, c) => df.withColumnRenamed(c, s"l_$c"))
      .withWatermark(s"l_ts", lateness)
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_ts", lateness)
    l.join(r, expr(
      s"l_$key = r_$key AND r_ts >= l_ts AND r_ts <= l_ts + interval $within"))
  }

  /** Incremental batch run (the reference's hourly cron re-expressed):
    * process exactly the feed files that arrived since the last run —
    * Trigger.AvailableNow drains available input then stops, and the
    * checkpoint remembers consumed files, so each invocation is one
    * incremental batch with exactly-once table semantics via the keyed
    * upsert. Call it from any scheduler; reprocessing is impossible
    * (checkpoint) AND harmless (upsert).
    */
  def runIncremental(
      spark: SparkSession,
      feedDir: String,
      schema: StructType,
      tablePath: String,
      keys: Seq[String],
      versionCol: String,
      checkpoint: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(feedDir)
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val latest = Upsert.latestPerKey(batch, keys, versionCol)
        Upsert.upsertParquet(batch.sparkSession, tablePath, latest, keys)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming keyed upsert: each micro-batch is collapsed to its latest
    * version per key and merged into the parquet table — the streaming
    * form of K1-K6 (at-least-once micro-batches ⇒ effectively-once
    * table).
    */
  def upsertSink(
      df: DataFrame,
      path: String,
      keys: Seq[String],
      versionCol: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val latest = Upsert.latestPerKey(batch, keys, versionCol)
        Upsert.upsertParquet(spark, path, latest, keys)
      }
      .start()
}
