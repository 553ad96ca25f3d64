package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.TxLogTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Tick(id: Long, v: String)

/** The transactional streaming sink: per-batch commits, and replay
  * idempotence through the log's (appId, epoch) dedup.
  */
class TxLogStreamSpec extends SparkSpec {
  import spark.implicits._

  test("txLogSink commits one version per micro-batch; replays are no-ops") {
    val tmp = Files.createTempDirectory("graft-txstream")
    val table = tmp.resolve("t").toString
    val ckpt = tmp.resolve("ckpt").toString
    implicit val sc = spark.sqlContext

    val source = MemoryStream[Tick]
    val q = StreamingOps.txLogSink(source.toDF(), table, "tickq", ckpt)
    try {
      source.addData(Tick(1L, "a"), Tick(2L, "b"))
      q.processAllAvailable()
      source.addData(Tick(3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val read0 = TxLogTable.read(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(read0 === Set((1L, "a"), (2L, "b"), (3L, "c")))
    val versionsAfter = TxLogTable.versions(spark, table)

    // simulate Structured Streaming's at-least-once replay after a
    // restart: the same batch ids arrive again
    val v1 = TxLogTable.append(Seq(Tick(1L, "a"), Tick(2L, "b")).toDF(),
      table, Some(("tickq", 0L)))
    val v2 = TxLogTable.append(Seq(Tick(3L, "c")).toDF(), table, Some(("tickq", 1L)))
    assert(v1 === versionsAfter.max && v2 === versionsAfter.max,
      "replayed epochs must not create new versions")
    assert(TxLogTable.versions(spark, table) === versionsAfter)
    val read1 = TxLogTable.read(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(read1 === read0, "replay changed table contents")

    // a genuinely NEW epoch still lands
    TxLogTable.append(Seq(Tick(4L, "d")).toDF(), table, Some(("tickq", 2L)))
    assert(TxLogTable.read(spark, table).count() === 4L)

    // a different appId has an independent epoch sequence
    TxLogTable.append(Seq(Tick(5L, "e")).toDF(), table, Some(("otherq", 0L)))
    assert(TxLogTable.read(spark, table).count() === 5L)
  }

  test("autoCompactEvery folds the micro-batch small-file tail inline") {
    val tmp = Files.createTempDirectory("graft-txauto")
    val table = tmp.resolve("t").toString
    val ckpt = tmp.resolve("ckpt").toString
    implicit val sc = spark.sqlContext

    val source = MemoryStream[Tick]
    val q = StreamingOps.txLogSink(source.toDF(), table, "autoq", ckpt,
      autoCompactEvery = Some(4),
      compactSmallFileBytes = 1L << 20, compactTargetFileBytes = 1L << 20)
    try {
      for (i <- 1 to 4) {
        source.addData(Tick(i.toLong, s"r$i"))
        q.processAllAvailable()
      }
    } finally q.stop()

    // 4 appends + at least one compaction landed; contents exact; the
    // live snapshot reads fewer files than the append count
    val acts = TxLogTable.history(spark, table)
      .select("action").collect().map(_.getString(0))
    assert(acts.count(_ == "append") === 4)
    assert(acts.contains("compact"), s"no compaction in ${acts.toSeq}")
    assert(TxLogTable.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      (1 to 4).map(i => (i.toLong, s"r$i")).toSet)
  }
}
