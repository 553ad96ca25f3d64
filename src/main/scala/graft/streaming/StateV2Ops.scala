package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful processing through the `transformWithState` v2
  * API (Spark 4.x): named typed state variables, per-key timers, and
  * state TTL — the three capabilities `flatMapGroupsWithState` lacks
  * (one monolithic state blob, one implicit timeout, manual eviction).
  * Requires the RocksDB state store provider; at 100 TB of keyed
  * state that is the point — RocksDB spills to local disk and
  * changelog-checkpoints to the store, so state size is bounded by
  * executor disk, not heap.
  *
  * Pacing: a ProcessingTime-mode transformWithState query runs a
  * micro-batch on EVERY trigger even without input (that is how
  * timers/TTL fire), so production queries should set
  * `Trigger.ProcessingTime(...)` to pace the empty batches —
  * the default ASAP trigger busy-loops the driver.
  */
object StateV2Ops {

  // ---- idle-gap activity digest (timer-driven emission) ------------

  final case class DigestEvent(userId: Long, value: Long)

  /** One digest per activity burst: event count, exact sum, and the
    * processing-time deadline that closed it.
    */
  final case class Digest(userId: Long, nEvents: Long, total: Long,
      closedAtMs: Long)

  /** Per-user burst digest: every input slides the user's deadline to
    * now + `gapMs` (drop old timer, arm new — the per-key timer API);
    * when the deadline expires with no further input, ONE digest row
    * is emitted and the state clears. This is processing-time
    * sessionization expressed with explicit timers instead of
    * `GroupStateTimeout` — the emission is exact (no per-batch
    * flushing), and state is two scalar variables per key, not a
    * collected event list.
    */
  final class ActivityDigestProcessor(gapMs: Long)
      extends StatefulProcessor[Long, DigestEvent, Digest] {

    @transient private var agg: ValueState[(Long, Long)] = _
    @transient private var deadline: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[(Long, Long)]("agg",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
      deadline = getHandle.getValueState[Long]("deadline",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[DigestEvent],
        tv: TimerValues): Iterator[Digest] = {
      var (n, tot) = if (agg.exists()) agg.get() else (0L, 0L)
      rows.foreach { e => n += 1; tot += e.value }
      agg.update((n, tot))
      if (deadline.exists()) getHandle.deleteTimer(deadline.get())
      val at = tv.getCurrentProcessingTimeInMs() + gapMs
      getHandle.registerTimer(at)
      deadline.update(at)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Digest] = {
      val out =
        if (agg.exists()) {
          val (n, tot) = agg.get()
          Iterator.single(Digest(key, n, tot, info.getExpiryTimeInMs()))
        } else Iterator.empty
      agg.clear()
      deadline.clear()
      out
    }
  }

  /** The digest stream (append mode — rows only on burst close). */
  def activityDigest(events: Dataset[DigestEvent],
      gapMs: Long): Dataset[Digest] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new ActivityDigestProcessor(gapMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  // ---- TTL first-seen filter (state-TTL-driven dedup) --------------

  final case class FirstSeen(fingerprint: String, firstSeenMs: Long)

  /** Emit each fingerprint the FIRST time it is seen within a rolling
    * `ttl` window; the runtime evicts the key automatically after the
    * TTL, so a fingerprint re-appearing later is "new" again. This is
    * streaming corpus dedup with bounded state: no manual timeout
    * bookkeeping, and state size is (active fingerprints within TTL),
    * not (all fingerprints ever) — the property that keeps a
    * 100 TB/day ingest's state store finite.
    */
  final class FirstSeenProcessor(ttl: Duration)
      extends StatefulProcessor[String, String, FirstSeen] {

    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[String],
        tv: TimerValues): Iterator[FirstSeen] = {
      rows.foreach(_ => ()) // drain — presence is all that matters
      if (seen.exists()) Iterator.empty
      else {
        val now = tv.getCurrentProcessingTimeInMs()
        seen.update(now)
        Iterator.single(FirstSeen(key, now))
      }
    }
  }

  def firstSeenWithTtl(fingerprints: Dataset[String],
      ttl: Duration): Dataset[FirstSeen] = {
    import fingerprints.sparkSession.implicits._
    fingerprints.groupByKey(identity)
      .transformWithState(new FirstSeenProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  // ---- event-time sessions (watermark-driven timers) ---------------

  final case class TsEvent(userId: Long, ts: java.sql.Timestamp, value: Long)

  final case class SessionClosed(userId: Long, nEvents: Long, total: Long,
      sessionEndMs: Long)

  /** Event-time sessionization with explicit EVENT-TIME timers: each
    * input extends the session and re-arms a timer at
    * `lastEventTs + gapMs`; the timer fires when the WATERMARK passes
    * it — so emission is driven by data completeness, not wall-clock,
    * and a stalled source never closes sessions early. Unlike the
    * ProcessingTime mode, batches only run on data (watermarks only
    * advance with input), so the op composes with
    * `processAllAvailable`-style draining.
    */
  final class EventSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TsEvent, SessionClosed] {

    @transient private var agg: ValueState[(Long, Long)] = _
    @transient private var deadline: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[(Long, Long)]("agg",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
      deadline = getHandle.getValueState[Long]("deadline",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TsEvent],
        tv: TimerValues): Iterator[SessionClosed] = {
      var (n, tot) = if (agg.exists()) agg.get() else (0L, 0L)
      var maxTs = if (deadline.exists()) deadline.get() - gapMs else Long.MinValue
      rows.foreach { e =>
        n += 1; tot += e.value
        maxTs = math.max(maxTs, e.ts.getTime)
      }
      agg.update((n, tot))
      if (deadline.exists()) getHandle.deleteTimer(deadline.get())
      val at = maxTs + gapMs
      getHandle.registerTimer(at) // event-time: fires when watermark >= at
      deadline.update(at)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionClosed] = {
      val out =
        if (agg.exists()) {
          val (n, tot) = agg.get()
          Iterator.single(SessionClosed(key, n, tot, info.getExpiryTimeInMs()))
        } else Iterator.empty
      agg.clear()
      deadline.clear()
      out
    }
  }

  def eventTimeSessions(events: Dataset[TsEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionClosed] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .transformWithState(new EventSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
