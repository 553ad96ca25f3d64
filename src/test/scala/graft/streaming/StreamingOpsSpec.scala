package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hourlyAgg over a file stream matches the batch aggregation") {
    val tmp = Files.createTempDirectory("graft-stream")
    val dataDir = tmp.resolve("in").toString
    val ckpt = tmp.resolve("ckpt").toString

    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:10:00"), 10L, "click", 1.5, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:40:00"), 11L, "click", 2.5, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 01:05:00"), 10L, "view", 4.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-01 01:50:00"), 12L, "click", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.parquet(dataDir)

    val stream = StreamingOps.readEventStream(spark, dataDir)
    assert(stream.isStreaming)
    val q = StreamingOps.hourlyAgg(stream)
      .writeStream
      .format("memory")
      .queryName("hourly_out")
      .outputMode("complete") // memory sink: complete shows all windows
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly_out")
      .orderBy("hour_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("2024-01-01 00:00:00.0", "click", 2L, 4.0),
      ("2024-01-01 01:00:00.0", "click", 1L, 8.0),
      ("2024-01-01 01:00:00.0", "view", 1L, 4.0)))
  }

  test("stream-stream interval join matches purchases to recent clicks") {
    val tmp = Files.createTempDirectory("graft-stream-join")
    val clickDir = tmp.resolve("clicks").toString
    val purchaseDir = tmp.resolve("purchases").toString
    val ckpt = tmp.resolve("ckpt").toString

    Seq(
      (10L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 0.0, "{}"),
      (11L, Timestamp.valueOf("2024-01-01 00:20:00"), 1L, "click", 0.0, "{}"),
      (12L, Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(clickDir)
    Seq(
      (20L, Timestamp.valueOf("2024-01-01 00:03:00"), 1L, "purchase", 9.0, "{}"), // joins click 10
      (21L, Timestamp.valueOf("2024-01-01 00:30:00"), 1L, "purchase", 9.0, "{}"), // outside 5min of 11? 00:20+5=00:25 < 00:30 → no match
      (22L, Timestamp.valueOf("2024-01-01 00:04:00"), 3L, "purchase", 9.0, "{}")) // no click user
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(purchaseDir)

    val q = StreamingOps.clickToPurchaseJoin(
        StreamingOps.readEventStream(spark, clickDir),
        StreamingOps.readEventStream(spark, purchaseDir))
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ssjoin_out")
      .select("user_id", "click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 10L, 20L)))
  }

  test("left-outer stream-stream join emits watermark-expired clicks with null purchase") {
    val tmp = Files.createTempDirectory("graft-stream-louter")
    val clickDir = tmp.resolve("clicks").toString
    val purchaseDir = tmp.resolve("purchases").toString
    val ckpt = tmp.resolve("ckpt").toString

    Seq(
      (10L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 0.0, "{}"), // converts
      (11L, Timestamp.valueOf("2024-01-01 00:20:00"), 2L, "click", 0.0, "{}")) // never converts
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(clickDir)
    Seq(
      (20L, Timestamp.valueOf("2024-01-01 00:03:00"), 1L, "purchase", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(purchaseDir)

    val q = StreamingOps.clickToPurchaseJoin(
        StreamingOps.readEventStream(spark, clickDir),
        StreamingOps.readEventStream(spark, purchaseDir),
        joinType = "leftOuter")
      .writeStream.format("memory").queryName("louter_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // click 11 is still inside its join window — not emitted yet
      assert(spark.table("louter_out").count() === 1)

      // late traffic on BOTH streams pushes the (min) watermark far
      // past click 11's window end → the unmatched click must flush
      Seq((12L, Timestamp.valueOf("2024-01-01 03:00:00"), 3L, "click", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(clickDir)
      Seq((21L, Timestamp.valueOf("2024-01-01 03:00:00"), 3L, "purchase", 9.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(purchaseDir)
      q.processAllAvailable()
      // one more micro-batch so the advanced watermark evicts state
      Seq((13L, Timestamp.valueOf("2024-01-01 03:30:00"), 4L, "click", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(clickDir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("louter_out")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got.contains((10L, 20L)))   // matched pair
    assert(got.contains((11L, -1L)))   // expired unmatched click, null purchase
  }

  test("dedupStream drops repeated fingerprints within the watermark") {
    val tmp = Files.createTempDirectory("graft-stream-dedup")
    val dataDir = tmp.resolve("in").toString
    val ckpt = tmp.resolve("ckpt").toString

    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "doc", 0.0, "same content"),
      (2L, Timestamp.valueOf("2024-01-01 00:05:00"), 2L, "doc", 0.0, "same content"),
      (3L, Timestamp.valueOf("2024-01-01 00:06:00"), 3L, "doc", 0.0, "different content"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.parquet(dataDir)

    val q = StreamingOps.dedupStream(
        StreamingOps.readEventStream(spark, dataDir),
        graft.ops.TextStats.fingerprint(col("props")))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val kept = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0)).sorted
    assert(kept.length === 2)
    assert(kept.contains(3L)) // distinct content survives
    assert(kept.count(id => id == 1L || id == 2L) === 1) // one of the dups
  }

  test("stateful sessionize splits on the inactivity gap") {
    val tmp = Files.createTempDirectory("graft-stream-sess")
    val dataDir = tmp.resolve("in").toString
    val ckpt = tmp.resolve("ckpt").toString

    def micros(s: String): Long = Timestamp.valueOf(s).getTime * 1000L
    // user 1: two bursts separated by > 30 min; user 2: one burst
    val rows = Seq(
      StreamingOps.SessionEvent(1L, 1L, micros("2024-01-01 00:00:00")),
      StreamingOps.SessionEvent(1L, 2L, micros("2024-01-01 00:10:00")),
      StreamingOps.SessionEvent(1L, 3L, micros("2024-01-01 01:00:00")),
      StreamingOps.SessionEvent(2L, 4L, micros("2024-01-01 00:05:00")))
    rows.toDS().write.parquet(dataDir)

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[StreamingOps.SessionEvent]].schema)
      .parquet(dataDir)
      .as[StreamingOps.SessionEvent]

    val q = StreamingOps.sessionize(stream, timeoutFlush = false)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    // only the session closed by a later in-batch event is emitted in
    // append mode without waiting for the processing-time timeout:
    // user 1's first burst (2 events, closed by the 01:00 event)
    val got = spark.table("sess_out").orderBy("user_id", "session_start_micros").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, micros("2024-01-01 00:00:00"), micros("2024-01-01 00:10:00"), 2L)))
  }

  test("stream-static join enriches each micro-batch from the dimension") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val source = MemoryStream[(Long, Long)]
    val enriched = StreamingOps.enrichStream(
      source.toDS().toDF("event_id", "user_id"), dim, "user_id", Seq("tier"))
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      source.addData((10L, 1L), (11L, 2L), (12L, 3L)) // 3L: no dim row
      q.processAllAvailable()
      val got = spark.table("enrich_out").orderBy("event_id")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), Option(r.getAs[String]("tier"))))
      assert(got.toSeq === Seq(
        (1L, Some("gold")), (2L, Some("basic")), (3L, None)))
    } finally q.stop()
  }

  test("declarative session_window agrees with the stateful sessionizer") {
    import java.sql.Timestamp
    // same burst pattern as the sessionize test, in batch mode (batch
    // session_window needs no watermark and emits ALL sessions, so
    // parity is checkable over the complete session set)
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 00:10:00")),
      (1L, Timestamp.valueOf("2024-01-01 01:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:05:00")))
      .toDF("user_id", "ts")
    val got = StreamingOps.sessionWindowAgg(rows)
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3)))
    // session_window end = last event + gap; starts and counts match
    // the state machine's sessions exactly
    assert(got.toSeq === Seq(
      (1L, "2024-01-01 00:00:00.0", 2L),
      (1L, "2024-01-01 01:00:00.0", 1L),
      (2L, "2024-01-01 00:05:00.0", 1L)))
  }

  test("bronze streaming sink partitions by event day and is exactly-once across restarts") {
    val tmp = Files.createTempDirectory("graft-stream-bronze")
    val dataDir = tmp.resolve("in").toString
    val outDir = tmp.resolve("bronze").toString
    val ckpt = tmp.resolve("ckpt").toString

    def run(): Unit = {
      val q = StreamingOps.writeBronzeStream(
        StreamingOps.readEventStream(spark, dataDir), outDir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }

    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-02 11:00:00"), 2L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dataDir)
    run()

    // restart the stream over a landing dir with one more file: the
    // checkpoint must skip the already-committed input and the file
    // sink's manifest must not duplicate earlier output
    Seq((3L, Timestamp.valueOf("2024-01-02 12:00:00"), 3L, "click", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dataDir)
    run()

    val bronze = spark.read.parquet(outDir)
    assert(bronze.count() === 3)
    assert(bronze.select("anomesdia").distinct().as[String].collect().sorted
      === Array("20240101", "20240102"))
    assert(bronze.select("event_id").as[Long].collect().sorted === Array(1L, 2L, 3L))
  }
}
