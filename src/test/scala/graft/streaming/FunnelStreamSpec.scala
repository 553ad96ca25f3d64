package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import StreamingOps.{FunnelEvent, FunnelUpdate}

/** Streaming funnel: per-user monotone stage machine across
  * micro-batches — strict event-time ordering, cross-batch state
  * carry-over, and idempotence under replayed events.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  test("funnelStages: strict order across micro-batches; replays are no-ops") {
    implicit val sc = spark.sqlContext
    val source = MemoryStream[FunnelEvent]
    val q = StreamingOps.funnelStages(source.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()

    def stages(): Set[(Long, Int)] =
      spark.table("funnel_out").as[FunnelUpdate].collect()
        .groupBy(_.user_id).map { case (u, ups) => (u, ups.map(_.stage).max) }.toSet

    try {
      // batch 1: u1 views; u2 clicks first (no view yet) then views;
      //          u3 views and purchases (skips click — must stall at 1)
      source.addData(
        FunnelEvent(1L, "view", 100L),
        FunnelEvent(2L, "click", 100L), FunnelEvent(2L, "view", 200L),
        FunnelEvent(3L, "view", 100L), FunnelEvent(3L, "purchase", 200L))
      q.processAllAvailable()
      assert(stages() === Set((1L, 1), (2L, 1), (3L, 1)))

      // batch 2: u1 clicks later than its view (advances, cross-batch
      // state); u2's click REPLAY at the old pre-view timestamp must
      // not advance; u3 clicks → 2
      source.addData(
        FunnelEvent(1L, "click", 500L),
        FunnelEvent(2L, "click", 100L),
        FunnelEvent(3L, "click", 300L))
      q.processAllAvailable()
      assert(stages() === Set((1L, 2), (2L, 1), (3L, 2)))

      // batch 3: u1 purchase at the SAME timestamp as its click is
      // not strictly later → stalls; a later purchase completes.
      // u3 purchase after click completes (its earlier purchase at
      // ts=200 must not count — it preceded the click)
      source.addData(
        FunnelEvent(1L, "purchase", 500L), FunnelEvent(1L, "purchase", 600L),
        FunnelEvent(3L, "purchase", 400L))
      q.processAllAvailable()
      assert(stages() === Set((1L, 3), (2L, 1), (3L, 3)))
    } finally q.stop()
  }
}
