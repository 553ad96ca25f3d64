package graft.streaming

import java.time.Duration

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import StateV2Ops.{Digest, DigestEvent, FirstSeen}

/** transformWithState (state v2): timer-driven burst digests and
  * TTL-evicted first-seen dedup over the RocksDB state store.
  *
  * Harness note: ProcessingTime-mode transformWithState queries run
  * micro-batches CONTINUOUSLY (each batch evaluates timers/TTL even
  * with no input), so `processAllAvailable` — which waits for a
  * no-new-data quiescent point — never returns. The tests poll the
  * committed source offset / the sink table instead.
  */
class StateV2OpsSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** transformWithState requires the RocksDB provider; scope it to the
    * test so other suites keep the default HDFS-backed store.
    */
  private def withRocksDb[T](f: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private def eventually(timeoutMs: Long, what: String)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis() + timeoutMs
    while (!cond) {
      if (System.currentTimeMillis() > end) fail(s"timed out waiting for $what")
      Thread.sleep(100L)
    }
  }

  /** Wait until the query has committed the source past `offsetJson`. */
  private def awaitCommitted(q: StreamingQuery, offsetJson: String): Unit =
    eventually(30000L, s"offset $offsetJson committed") {
      Option(q.lastProgress).exists(p => p.sources.nonEmpty &&
        Option(p.sources.head.endOffset).exists(_.trim.toLong >= offsetJson.trim.toLong))
    }

  test("activity digest emits once per burst when the timer expires") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val source = MemoryStream[DigestEvent]
      val gapMs = 8000L
      val q = StateV2Ops.activityDigest(source.toDS(), gapMs = gapMs)
        .writeStream.format("memory").queryName("digest_out")
        .outputMode("append").start()
      try {
        val t0 = System.currentTimeMillis()
        val o1 = source.addData(DigestEvent(1L, 10L), DigestEvent(1L, 5L),
          DigestEvent(2L, 7L))
        awaitCommitted(q, o1.json)
        // deadlines still open — nothing emitted (only assertable while
        // we are actually still inside the gap window)
        if (System.currentTimeMillis() - t0 < gapMs / 2)
          assert(spark.table("digest_out").isEmpty)
        // extend user 1's burst (slides its deadline)
        val o2 = source.addData(DigestEvent(1L, 1L))
        awaitCommitted(q, o2.json)
        val extendedInTime = System.currentTimeMillis() - t0 < gapMs
        // both deadlines lapse; the continuous timer batches emit
        eventually(40000L, "both digests") {
          spark.table("digest_out").count() >= 2L
        }
        val got = spark.table("digest_out").as[Digest].collect()
          .map(d => d.userId -> (d.nEvents, d.total)).toMap
        assert(got(2L) === ((1L, 7L)))
        // user 1's burst contains the extension iff it landed in time
        // (on an unloaded host it always does)
        if (extendedInTime) assert(got(1L) === ((3L, 16L)))
        // a NEW burst for user 1 digests independently (state cleared).
        // Guard (same discipline as the :68/:83 wall-clock guards): if
        // the extension event landed AFTER the first burst's gap lapsed
        // it opened its OWN burst, which is still inside its gap window
        // here — adding 100L now would merge into it as (2, 101). Wait
        // until emitted user-1 digests account for ALL 3 prior user-1
        // events, so no open burst remains to absorb the new event.
        eventually(40000L, "all 3 prior user-1 events digested") {
          spark.table("digest_out").as[Digest].collect()
            .filter(_.userId == 1L).map(_.nEvents).sum == 3L
        }
        val user1Before = spark.table("digest_out").as[Digest].collect()
          .count(_.userId == 1L)
        source.addData(DigestEvent(1L, 100L))
        eventually(40000L, "next digest for user 1") {
          spark.table("digest_out").as[Digest].collect()
            .count(_.userId == 1L) > user1Before
        }
        val second = spark.table("digest_out").as[Digest].collect()
          .filter(_.userId == 1L).sortBy(_.closedAtMs)
        assert((second.last.nEvents, second.last.total) === ((1L, 100L)))
      } finally q.stop()
    }
  }

  test("event-time sessions close when the watermark passes the gap, not wall-clock") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      import StateV2Ops.{SessionClosed, TsEvent}
      def ev(u: Long, sec: Long, v: Long) =
        TsEvent(u, new java.sql.Timestamp(sec * 1000L), v)
      val source = MemoryStream[TsEvent]
      val q = StateV2Ops.eventTimeSessions(source.toDS(), gapMs = 5000L)
        .writeStream.format("memory").queryName("sess_out")
        .outputMode("append").start()
      try {
        // u1 at t=10s,12s; u2 at t=11s → deadlines 17s / 16s
        source.addData(ev(1L, 10L, 5L), ev(1L, 12L, 7L), ev(2L, 11L, 1L))
        q.processAllAvailable()
        assert(spark.table("sess_out").isEmpty,
          "sessions must not close before the watermark reaches the gap")
        // wall-clock passing changes nothing — only the watermark counts
        Thread.sleep(1500L)
        source.addData(ev(99L, 13L, 0L)) // watermark after batch: 13s
        q.processAllAvailable()
        assert(spark.table("sess_out").isEmpty)
        // an event at t=30s pushes the watermark past both deadlines;
        // the NEXT batch evaluates timers against it
        source.addData(ev(98L, 30L, 0L))
        q.processAllAvailable()
        source.addData(ev(97L, 31L, 0L))
        q.processAllAvailable()
        val got = spark.table("sess_out").as[SessionClosed].collect()
          .map(s => s.userId -> ((s.nEvents, s.total, s.sessionEndMs))).toMap
        assert(got(1L) === ((2L, 12L, 17000L)))
        assert(got(2L) === ((1L, 1L, 16000L)))
      } finally q.stop()
    }
  }

  test("first-seen TTL dedup: duplicates suppressed, key revives after eviction") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val source = MemoryStream[String]
      val ttlMs = 8000L
      val q = StateV2Ops.firstSeenWithTtl(source.toDS(), Duration.ofMillis(ttlMs))
        .writeStream.format("memory").queryName("seen_out")
        .outputMode("append").start()
      try {
        def emitted(): Seq[String] =
          spark.table("seen_out").as[FirstSeen].collect()
            .map(_.fingerprint).toSeq
        val t0 = System.currentTimeMillis()
        val o1 = source.addData("a", "b", "a")
        awaitCommitted(q, o1.json)
        eventually(30000L, "first a and b") { emitted().size >= 2 }
        assert(emitted().sorted === Seq("a", "b"),
          "within-batch duplicate must be suppressed")
        // within TTL: still suppressed (assertable only while inside
        // the TTL window)
        val o2 = source.addData("a")
        awaitCommitted(q, o2.json)
        if (System.currentTimeMillis() - t0 < ttlMs / 2)
          assert(emitted().sorted === Seq("a", "b"))
        // after TTL eviction the fingerprint counts as new again
        Thread.sleep(ttlMs + 1500L)
        source.addData("a")
        eventually(30000L, "revived a") {
          emitted().count(_ == "a") >= 2
        }
        assert(emitted().count(_ == "b") === 1)
      } finally q.stop()
    }
  }
}
