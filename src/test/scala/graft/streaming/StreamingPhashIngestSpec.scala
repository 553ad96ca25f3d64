package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import graft.sink.TxLogTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `StreamingOps.phashDedupIngest`: the streamed incremental
  * perceptual-hash dedup must produce EXACTLY the verdicts of the
  * sequential batch composition (co-arrival collapse → probe state →
  * drop → append kept state, batch by batch, via the same `Dedup`
  * ops q317 oracle-gates), a hash dropped in batch N must never
  * enter the state batch N+1 probes, and the sharded append-only
  * index must reproduce single-index semantics (lshIndexShard's
  * cap+1 tombstone + merge-probe cap).
  */
class StreamingPhashIngestSpec extends SparkSpec {
  import spark.implicits._

  private val BITS = 15
  private val BANDS = 4
  private val MAXH = 3
  private val CAP = 64

  private val mask = (1L << 60) - 1
  private def flip(h: Long, bits: Int*): Long =
    bits.foldLeft(h)((a, b) => a ^ (1L << b))
  private val base = 0x0123456789ABCL & mask

  private def freshTables(): (String, String, String) = {
    def t(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (hashT, idxT, outT) = (t("spi_hash"), t("spi_idx"), t("spi_out"))
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "ah")
    TxLogTable.create(spark, hashT, empty.schema)
    TxLogTable.create(spark, idxT,
      Dedup.lshIndexShard(
        Dedup.hammingBands(empty, "doc_id", "ah", BITS, BANDS),
        "doc_id", CAP).schema)
    TxLogTable.create(spark, outT, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("new_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seen_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("hamming", org.apache.spark.sql.types.LongType))))
    (hashT, idxT, outT)
  }

  // batch 1: two far-apart hashes. batch 2: a 1-bit twin of doc 1
  // (dropped) and a novel hash (kept). batch 3: another twin of
  // doc 1 — it must match 1 (the kept original), never the dropped
  // 10 — plus a 1-bit twin of batch 2's KEPT doc. batch 4: two
  // CO-ARRIVING copies of a novel hash — the higher id drops in the
  // same micro-batch. batch 5: a 1-bit twin — it must match 30 (the
  // kept co-arrival), never 31 (the dropped one).
  private val far = ~base & mask
  private val novel2 = 0x0FEDCBA987654L & mask
  private val novel3 = 0x05A5A5A5A5A5AL & mask
  private val batches = Seq(
    Seq((1L, base), (2L, far)),
    Seq((10L, flip(base, 7)), (11L, novel2)),
    Seq((20L, flip(base, 9)), (21L, flip(novel2, 5))),
    Seq((30L, novel3), (31L, novel3)),
    Seq((40L, flip(novel3, 59))))

  test("stream verdicts equal the sequential batch composition; dropped hashes never enter state") {
    // reference: the same ops applied batch-by-batch directly
    val (rHash, rIdx, rOut) = freshTables()
    for ((b, i) <- batches.zipWithIndex) {
      val bh = b.toDF("doc_id", "ah").localCheckpoint()
      val newBands = Dedup.hammingBands(bh, "doc_id", "ah", BITS, BANDS)
        .localCheckpoint()
      val inner = Dedup.hammingDupIncremental(bh, bh,
          Dedup.lshIndex(newBands, "doc_id", maxIdsPerSig = 0),
          "doc_id", "ah", BITS, BANDS, MAXH)
        .filter(col("new_id") > col("seen_id"))
      val cross = Dedup.hammingDupIncremental(bh,
        TxLogTable.read(spark, rHash),
        Dedup.lshIndexMergeProbe(TxLogTable.read(spark, rIdx), newBands, CAP),
        "doc_id", "ah", BITS, BANDS, MAXH)
      val drops = cross.unionAll(inner).localCheckpoint()
      TxLogTable.append(drops, rOut, Some(("ref-out", i.toLong)))
      val kept = bh.join(drops.select(col("new_id").as("doc_id")),
        Seq("doc_id"), "left_anti").localCheckpoint()
      TxLogTable.append(kept, rHash, Some(("ref-hash", i.toLong)))
      TxLogTable.append(
        Dedup.lshIndexShard(
          Dedup.hammingBands(kept, "doc_id", "ah", BITS, BANDS),
          "doc_id", CAP),
        rIdx, Some(("ref-idx", i.toLong)))
    }
    val expected = TxLogTable.read(spark, rOut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the dropped-doc AND co-arrival contracts, pinned explicitly
    assert(expected === Set(
      (10L, 1L, 1L), (20L, 1L, 1L), (21L, 11L, 1L),
      (31L, 30L, 0L), (40L, 30L, 1L)))

    // stream: MemoryStream drained batch by batch through the sink
    val (sHash, sIdx, sOut) = freshTables()
    val ckpt = java.nio.file.Files.createTempDirectory("spi_ck").toString
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = StreamingOps.phashDedupIngest(
      ms.toDF.toDF("doc_id", "ah"), sHash, sIdx, sOut, "spi", ckpt)
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    val got = TxLogTable.read(spark, sOut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // dropped ids (10, 20, 21, 31, 40) appear in NO shard
    val idxIds = TxLogTable.read(spark, sIdx)
      .select(explode(col("ids")).as("id")).as[Long].collect().toSet
    assert(idxIds === Set(1L, 2L, 11L, 30L))
  }

  test("co-arriving near-dup group larger than the index cap still collapses to its lowest id") {
    val (sHash, sIdx, sOut) = freshTables()
    val ckpt = java.nio.file.Files.createTempDirectory("spi_ck2").toString
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = StreamingOps.phashDedupIngest(
      ms.toDF.toDF("doc_id", "ah"), sHash, sIdx, sOut, "spi2", ckpt,
      maxIdsPerSig = 2)
    try {
      ms.addData((50L to 54L).map(i => (i, base))); q.processAllAvailable()
      ms.addData(Seq((60L, flip(base, 13)))); q.processAllAvailable()
    } finally q.stop()
    val drops = TxLogTable.read(spark, sOut)
      .select("new_id", "seen_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clique = for (j <- 50L to 54L; i <- (j + 1) to 54L) yield (i, j)
    assert(drops === (clique.toSet + ((60L, 50L))))
    val idxIds = TxLogTable.read(spark, sIdx)
      .select(explode(col("ids")).as("id")).as[Long].collect().toSet
    assert(idxIds === Set(50L))
  }

  // ADVICE r16 follow-through: a duplicated id within one micro-batch
  // (at-least-once delivery) must collapse to one state and one index
  // row — each copy would otherwise keep the other alive through the
  // new_id > seen_id self-probe filter and the left_anti.
  test("a duplicated id within one batch leaves one state row and one index membership") {
    val (sHash, sIdx, sOut) = freshTables()
    val ckpt = java.nio.file.Files.createTempDirectory("spi_ck3").toString
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = StreamingOps.phashDedupIngest(
      ms.toDF.toDF("doc_id", "ah"), sHash, sIdx, sOut, "spi3", ckpt)
    try {
      ms.addData(Seq((5L, base), (5L, base), (6L, far)))
      q.processAllAvailable()
    } finally q.stop()
    val state = TxLogTable.read(spark, sHash)
      .select("doc_id").as[Long].collect().toList.sorted
    assert(state === List(5L, 6L))
    assert(TxLogTable.read(spark, sOut).isEmpty) // no self-pair
    // the index shard holds each id at most once per bucket
    val perBucket = TxLogTable.read(spark, sIdx)
      .select(size(col("ids")).as("n"), size(array_distinct(col("ids"))).as("d"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(perBucket.forall { case (n, dct) => n == dct })
  }
}
