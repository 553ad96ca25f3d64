package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Checkpoint recovery: a stopped query restarted on the same
  * checkpoint resumes its state and does NOT re-emit or re-count the
  * batches it already processed — the exactly-once property a
  * production stream restarts on after an executor or driver loss.
  * Uses the real file source + checkpoint machinery (MemoryStream
  * state dies with the query, so it cannot test this).
  */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows(ids: Range, tsBase: String) =
    ids.map(i => (i.toLong, Timestamp.valueOf(s"$tsBase:0${i % 6}.0"),
      (i % 3).toLong, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("aggregation state survives a stop/restart on the same checkpoint") {
    val inDir = Files.createTempDirectory("graft-restart-in").toString
    val ckpt = Files.createTempDirectory("graft-restart-ck").toString
    val outTable = "restart_counts"

    // complete-mode keyed counts sidestep watermark finalization — the
    // point here is state recovery, not window emission timing
    def start() = StreamingOps.readEventStream(spark, inDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(outTable)
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .start()

    eventRows(0 until 12, "2024-01-01 10:00")
      .write.mode("append").parquet(inDir)
    val q1 = start()
    q1.processAllAvailable()
    val afterB1 = spark.table(outTable).as[(Long, Long)].collect().toMap
    assert(afterB1.values.sum === 12L)
    q1.stop()

    // second generation of files lands while the query is DOWN
    eventRows(100 until 106, "2024-01-01 11:00")
      .write.mode("append").parquet(inDir)
    val q2 = start()
    q2.processAllAvailable()
    val afterB2 = spark.table(outTable).as[(Long, Long)].collect().toMap
    q2.stop()

    // counts include BOTH generations exactly once: 18 total, and the
    // per-user increments equal just the new batch's contribution
    assert(afterB2.values.sum === 18L)
    (0L until 3L).foreach { u =>
      assert(afterB2(u) - afterB1(u) === 2L,
        s"user $u should gain exactly the 2 new rows, " +
          s"got ${afterB1(u)} -> ${afterB2(u)}")
    }
  }
}
