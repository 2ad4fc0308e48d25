package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key cumulative-spend milestone detection on Spark 4's
  * `transformWithState` arbitrary-state API (the v2 successor of
  * `mapGroupsWithState`, RocksDB-backed): the processor keeps ONE long of
  * state per user — the running spend in cents — and emits a row each
  * time the total crosses another `stepCents` boundary.
  *
  * Determinism: amounts are exact cents (quantized through DECIMAL
  * upstream, so the fold is integer addition — associative, no float
  * drift), and rows are sorted by (event time, event_id) inside each
  * batch before folding. State is 8 bytes per user forever — the
  * lifetime-value topology that runs unchanged against an unbounded
  * feed, where the watermark-windowed operators (e11/e20) would have to
  * drop history.
  *
  * Reference: the rebuild's streaming surface (SURVEY §2.7); no direct
  * analog in `/root/reference` (its pipelines are stateless hourly
  * batches, src/etl-square-payments.ts:18-25).
  */
object Milestones {

  /** One purchase, times in microseconds, amount in exact cents. */
  final case class Purchase(user_id: Long, event_id: Long, ts_us: Long, cents: Long)

  /** Emitted when a user's cumulative spend enters a new step bucket. */
  final case class Crossing(user_id: Long, event_id: Long, cum_cents: Long, milestone: Long)

  /** StatefulProcessor with a single ValueState[Long] per user. */
  final class SpendMilestones(stepCents: Long)
      extends StatefulProcessor[Long, Purchase, Crossing] {

    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Purchase],
        timerValues: TimerValues): Iterator[Crossing] = {
      // In-batch event-time order: the fold must see a user's purchases
      // in the same order the SQL window does, not file-arrival order.
      val sorted = rows.toArray.sortBy(p => (p.ts_us, p.event_id))
      var c = if (cum.exists()) cum.get() else 0L
      val out = Array.newBuilder[Crossing]
      sorted.foreach { p =>
        val before = c / stepCents
        c += p.cents
        val after = c / stepCents
        if (after > before) out += Crossing(key, p.event_id, c, after)
      }
      cum.update(c)
      out.result().iterator
    }
  }

  /** One observation of a key at an event time. */
  final case class Seen(user_id: Long, ts: java.sql.Timestamp)

  /** Emitted when a key's event-time inactivity timer fires. */
  final case class Inactive(user_id: Long, last_seen_ms: Long)

  /** Event-time TIMER demo on the same API: per key, keep the latest
    * event time and an armed timer at `lastSeen + gapMs`; every new
    * observation disarms the old timer and arms a fresh one. When the
    * WATERMARK passes an armed timer, [[handleExpiredTimer]] fires once,
    * emits the inactivity alert, and clears the key's state — the
    * churn/inactivity-alert topology (and the state-GC pattern: expired
    * keys leave the store, so state tracks ACTIVE keys, not history).
    * Deterministic under the e-family sentinel discipline: alerts
    * depend only on event times and the watermark the sentinels set,
    * never on wall clock.
    */
  final class InactivityMonitor(gapMs: Long)
      extends StatefulProcessor[Long, Seen, Inactive] {

    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Seen],
        timerValues: TimerValues): Iterator[Inactive] = {
      val newest = rows.map(_.ts.getTime).max
      if (lastSeen.exists()) {
        val prev = lastSeen.get()
        if (newest > prev) {
          getHandle.deleteTimer(prev + gapMs)
          getHandle.registerTimer(newest + gapMs)
          lastSeen.update(newest)
        }
      } else {
        getHandle.registerTimer(newest + gapMs)
        lastSeen.update(newest)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Inactive] = {
      val last = lastSeen.get()
      lastSeen.clear()
      Iterator.single(Inactive(key, last))
    }
  }
}
