package graft.streaming

import graft.SparkSpec
import graft.sink.TxLogTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `StreamingOps.exactDedupIngest`: the streamed exact dedup must
  * produce EXACTLY the verdicts of the sequential batch composition,
  * co-arriving exact copies must collapse to the smallest id
  * (order-free), a content dropped in batch N must never enter the
  * state batch N+1 probes (its matches point at the original
  * canonical forever), and txn-tagged replays must no-op.
  */
class StreamingExactIngestSpec extends SparkSpec {
  import spark.implicits._

  private def freshTables(): (String, String) = {
    def t(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (hashT, outT) = (t("sei_hash"), t("sei_out"))
    TxLogTable.create(spark, hashT, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__h", org.apache.spark.sql.types.StringType))))
    TxLogTable.create(spark, outT, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("new_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seen_id", org.apache.spark.sql.types.LongType))))
    (hashT, outT)
  }

  private val A = "alpha document body"
  private val B = "beta document body"
  private val C = "gamma document body"
  // batch 1: two distinct docs. batch 2: an exact copy of A (drops to
  // 1) + a novel doc. batch 3: THREE co-arriving copies of a novel
  // content, delivered in descending-id order — they still collapse
  // to the SMALLEST id (31, 32 → 30), order-free. batch 4: another
  // copy of C — it must match 30 (the kept canonical), never 31/32,
  // plus a copy of batch 2's dropped A-copy content → still maps to 1.
  private val batches = Seq(
    Seq((1L, A), (2L, B)),
    Seq((10L, A), (11L, "delta document body")),
    Seq((32L, C), (31L, C), (30L, C)),
    Seq((40L, C), (41L, A)))

  test("stream verdicts equal the sequential composition; dropped content never enters state") {
    val (sHash, sOut) = freshTables()
    val ckpt = java.nio.file.Files.createTempDirectory("sei_ck").toString
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.exactDedupIngest(
      ms.toDF.toDF("doc_id", "text"), sHash, sOut, "sei", ckpt)
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val got = TxLogTable.read(spark, sOut)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(
      (10L, 1L),               // cross-batch exact match
      (31L, 30L), (32L, 30L),  // co-arrival min-id collapse
      (40L, 30L),              // matches the kept canonical, not 31/32
      (41L, 1L)))              // content of a DROPPED doc maps to the original
    // state holds exactly the canonical ids, one row per content
    val stateIds = TxLogTable.read(spark, sHash)
      .select("doc_id").as[Long].collect().toSet
    assert(stateIds === Set(1L, 2L, 11L, 30L))
    // replay idempotence: re-appending under a committed txn tag no-ops
    val outBefore = TxLogTable.read(spark, sOut).count()
    TxLogTable.append(Seq((99L, 1L)).toDF("new_id", "seen_id"),
      sOut, Some(("sei-out", (batches.length - 1).toLong)))
    assert(TxLogTable.read(spark, sOut).count() === outBefore)
  }

  // ADVICE r16: a DUPLICATED ID within one micro-batch (at-least-once
  // sources can deliver the same (id, text) row twice in one batch)
  // must collapse to one state row — each copy would otherwise keep
  // the other alive through the co-arrival filter and the left_anti,
  // appending duplicate rows for one content to the hash state.
  test("a duplicated id within one batch leaves exactly one state row") {
    val (sHash, sOut) = freshTables()
    val ckpt = java.nio.file.Files.createTempDirectory("sei_ck2").toString
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.exactDedupIngest(
      ms.toDF.toDF("doc_id", "text"), sHash, sOut, "sei2", ckpt)
    try {
      ms.addData(Seq((5L, A), (5L, A), (6L, B)))
      q.processAllAvailable()
    } finally q.stop()
    val state = TxLogTable.read(spark, sHash)
      .select("doc_id").as[Long].collect().toList.sorted
    assert(state === List(5L, 6L)) // one row per id, no duplicate 5s
    assert(TxLogTable.read(spark, sOut).isEmpty) // no self-pair emitted
  }
}
