package graft.ops

import graft.SparkSpec
import graft.sink.TxLogTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental-dedup state tables LIVE in TxLog tables in
  * production (ACID appends, time travel, exactly-once batch commits
  * via txn) — q315/q316 pin the state in-query only because the
  * DuckDB oracle must re-derive it. This spec closes the loop: state
  * written through `TxLogTable`, read back, and probed must behave
  * exactly like the direct frames, and the continuous-ingest cycle
  * (probe → drop dups → APPEND the kept arrivals' state → next batch
  * sees them) must work across commits.
  */
class IncrementalStateTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("state_tbl").toString

  private val K = 8
  private val RPB = 2

  private def sigs(df: DataFrame): DataFrame =
    Dedup.minhashSignatures(df, "doc_id", Dedup.shingles(col("text"), 3), K)

  test("semantic state round-trips through a TxLog table unchanged") {
    val cents = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("cell", "cv")
    val seen = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.8, 0.2)),
      (4L, Array(0.0, 1.0))).toDF("vec_id", "v")
    val reps = Dedup.cellRepresentatives(seen, cents, "vec_id", "v")
    val path = tmp()
    TxLogTable.overwrite(reps, path)
    val stored = TxLogTable.read(spark, path)
    val batch = Seq(
      (10L, Array(0.99, 0.01)), (11L, Array(0.55, 0.45)),
      (12L, Array(0.02, 0.97))).toDF("vec_id", "v")
    def drops(st: DataFrame) =
      Dedup.semanticDupIncremental(batch, st, cents, "vec_id", "v", tau = 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(drops(stored) === drops(reps))
    assert(drops(stored) === Set((0L, 1L, 10L), (1L, 4L, 12L)))
  }

  test("LSH state appends across batches: batch 3 matches batch 2's kept arrivals") {
    val sigPath = tmp(); val idxPath = tmp()
    // batch 1 ingests; its state is committed (txn-keyed: a replayed
    // commit with the same epoch would no-op)
    val b1 = Seq((1L, "the quick brown fox jumps over the lazy dog near the river"))
      .toDF("doc_id", "text")
    val sg1 = sigs(b1)
    TxLogTable.append(sg1, sigPath, txn = Some(("ingest", 1L)))
    TxLogTable.append(
      Dedup.lshBandsFromSignatures(sg1, "doc_id", K, RPB), idxPath,
      txn = Some(("ingest", 1L)))
    // batch 2: one dup of doc 1 (dropped), one novel doc (kept — its
    // state appends as epoch 2)
    val b2 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river"),
      (11L, "a completely novel document about catalyst expression codegen internals"))
      .toDF("doc_id", "text")
    val sg2 = sigs(b2).localCheckpoint()
    def probe(batchSigs: DataFrame): DataFrame = {
      val storedSigs = TxLogTable.read(spark, sigPath)
      val idx = Dedup.lshIndex(TxLogTable.read(spark, idxPath), "doc_id")
      Dedup.lshDupIncremental(batchSigs, storedSigs, idx, "doc_id", K, RPB, 2)
    }
    val drops2 = probe(sg2).select("new_id").as[Long].collect().toSet
    assert(drops2 === Set(10L))
    val kept2 = sg2.filter(!col("doc_id").isin(drops2.toSeq: _*))
    TxLogTable.append(kept2, sigPath, txn = Some(("ingest", 2L)))
    TxLogTable.append(
      Dedup.lshBandsFromSignatures(kept2, "doc_id", K, RPB), idxPath,
      txn = Some(("ingest", 2L)))
    // batch 3 dups BOTH batch 1's doc and batch 2's kept novel doc —
    // the appended state must catch the latter
    val b3 = Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the river"),
      (21L, "a completely novel document about catalyst expression codegen internals"))
      .toDF("doc_id", "text")
    val out3 = probe(sigs(b3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out3 === Set((20L, 1L), (21L, 11L)))
    // replayed epoch-2 commit is a no-op: state unchanged, batch 3
    // verdict identical (exactly-once over at-least-once delivery)
    TxLogTable.append(kept2, sigPath, txn = Some(("ingest", 2L)))
    val replay = probe(sigs(b3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay === out3)
  }
}
