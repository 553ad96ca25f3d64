package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import graft.sink.TxLogTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `StreamingOps.lshDedupIngest`: the streamed incremental LSH dedup
  * must produce EXACTLY the verdicts of the sequential batch
  * composition (probe state → drop → append kept state, batch by
  * batch, via the same `Dedup` ops q316 oracle-gates), and a doc
  * dropped in batch N must never enter the state batch N+1 probes.
  */
class StreamingDedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val RPB = 2

  private def sigs(df: DataFrame): DataFrame =
    Dedup.minhashSignatures(df, "doc_id", Dedup.shingles(col("text"), 3), K)

  private def freshTables(): (String, String, String) = {
    def t(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (sigT, idxT, outT) = (t("sdi_sig"), t("sdi_idx"), t("sdi_out"))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    TxLogTable.create(spark, sigT, sigs(empty).schema)
    TxLogTable.create(spark, idxT,
      Dedup.lshBandsFromSignatures(sigs(empty), "doc_id", K, RPB).schema)
    TxLogTable.create(spark, outT, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("new_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seen_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_match", org.apache.spark.sql.types.LongType))))
    (sigT, idxT, outT)
  }

  // batch 1: two distinct docs. batch 2: a dup of doc 1 (dropped) and
  // a novel doc (kept). batch 3: a dup of batch 2's DROPPED doc — it
  // must still match doc 1 (the kept original), never doc 10 — and a
  // dup of batch 2's KEPT doc.
  private val batches = Seq(
    Seq((1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "an entirely different document about spark catalyst optimizer rules")),
    Seq((10L, "the quick brown fox jumps over the lazy dog by the river"),
      (11L, "novel prose describing adaptive query execution and skew handling")),
    Seq((20L, "the quick brown fox jumps over the lazy dog by the river"),
      (21L, "novel prose describing adaptive query execution and skew handling")))

  test("stream verdicts equal the sequential batch composition; dropped docs never enter state") {
    // reference: the same ops applied batch-by-batch directly
    val (rSig, rIdx, rOut) = freshTables()
    for ((b, i) <- batches.zipWithIndex) {
      val bs = sigs(b.toDF("doc_id", "text")).localCheckpoint()
      val drops = Dedup.lshDupIncremental(bs, TxLogTable.read(spark, rSig),
          Dedup.lshIndex(TxLogTable.read(spark, rIdx), "doc_id", 64),
          "doc_id", K, RPB, 2)
        .localCheckpoint()
      TxLogTable.append(drops, rOut, Some(("ref-out", i.toLong)))
      val kept = bs.join(drops.select(col("new_id").as("doc_id")),
        Seq("doc_id"), "left_anti").localCheckpoint()
      TxLogTable.append(kept, rSig, Some(("ref-sig", i.toLong)))
      TxLogTable.append(Dedup.lshBandsFromSignatures(kept, "doc_id", K, RPB),
        rIdx, Some(("ref-idx", i.toLong)))
    }
    val expected = TxLogTable.read(spark, rOut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the dropped-doc contract, pinned explicitly
    assert(expected === Set((10L, 1L, 8L), (20L, 1L, 8L), (21L, 11L, 8L)))

    // stream: MemoryStream drained batch by batch through the sink
    val (sSig, sIdx, sOut) = freshTables()
    val ckpt = java.nio.file.Files.createTempDirectory("sdi_ck").toString
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.lshDedupIngest(
      ms.toDF.toDF("doc_id", "text"), sSig, sIdx, sOut, "sdi", ckpt)
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val got = TxLogTable.read(spark, sOut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }
}
