package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

  /** One event observation for the per-type counting processor. */
  final case class TypedEvent(user_id: Long, event_id: Long, ts_us: Long, event_type: String)

  /** Emitted when a (user, type) count reaches a power of two. */
  final case class TypeMilestone(user_id: Long, event_id: Long, event_type: String, n: Long)

  /** MapState demo on the arbitrary-state v2 API: per user, a
    * `MapState[String, Long]` holds one running counter PER EVENT TYPE
    * (the per-key sub-keyed state shape `ValueState` cannot express
    * without packing), and a row is emitted each time a (user, type)
    * counter reaches a power of two — the classic log-throttled alert
    * cadence (1st, 2nd, 4th, 8th… occurrence).
    *
    * Determinism: emission depends only on each row's position in the
    * (ts_us, event_id) order of its (user, type) stream — integer
    * counters, no wall clock, no watermark dependence — so output is
    * identical however the feed is batched. State is one long per
    * DISTINCT (user, type), not per event: bounded by the type
    * vocabulary, the shape that scales to unbounded feeds.
    */
  final class TypeCounters extends StatefulProcessor[Long, TypedEvent, TypeMilestone] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[TypeMilestone] = {
      val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
      val out = Array.newBuilder[TypeMilestone]
      sorted.foreach { e =>
        val n = (if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L) + 1L
        counts.updateValue(e.event_type, n)
        if ((n & (n - 1L)) == 0L) out += TypeMilestone(key, e.event_id, e.event_type, n)
      }
      out.result().iterator
    }
  }

  /** Rolling last-3 emission from the ListState processor: exact
    * integer sum and count of the trailing window ending at this row. */
  final case class Trailing(user_id: Long, event_id: Long, cents: Long, sum3: Long, n3: Long)

  /** ListState demo on the same API: per user, a `ListState[Long]`
    * carries the last ≤3 purchase amounts (exact cents); every incoming
    * purchase emits the trailing-window sum/count INCLUDING itself, then
    * the list is re-put trimmed to the newest 3 — bounded state (24
    * bytes per user) for a ROWS-frame rolling statistic over an
    * unbounded feed. The oracle replays it as `sum/count OVER (ROWS 2
    * PRECEDING)`.
    *
    * Determinism: in-batch (ts_us, event_id) sort + integer arithmetic;
    * emission is per input row, so output is batching-independent.
    */
  final class TrailingSpend extends StatefulProcessor[Long, Purchase, Trailing] {

    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Long]("recent", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Purchase],
        timerValues: TimerValues): Iterator[Trailing] = {
      val sorted = rows.toArray.sortBy(p => (p.ts_us, p.event_id))
      // Oldest-first window of the last ≤3 amounts seen before this batch.
      var window = recent.get().toArray
      val out = Array.newBuilder[Trailing]
      sorted.foreach { p =>
        window = (window :+ p.cents).takeRight(3)
        out += Trailing(key, p.event_id, p.cents, window.sum, window.length.toLong)
      }
      recent.put(window)
      out.result().iterator
    }
  }
}
