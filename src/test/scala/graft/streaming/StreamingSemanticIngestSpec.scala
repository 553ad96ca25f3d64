package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import graft.sink.TxLogTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `StreamingOps.semanticDedupIngest`: the streamed incremental
  * SemDeDup must produce EXACTLY the verdicts of the sequential batch
  * composition (assign → drop vs stored reps → elect reps for empty
  * cells → co-arrival collapse → append, batch by batch, via the same
  * `Dedup` ops q315 oracle-gates), the state must stay O(k) (one row
  * per non-empty cell, appended once, never rewritten), the within-
  * batch representative election must be ORDER-FREE, and txn-tagged
  * replays must no-op.
  */
class StreamingSemanticIngestSpec extends SparkSpec {
  import spark.implicits._

  private val TAU = 0.9

  private def centroids: DataFrame =
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cell", "cv")

  private def freshTables(): (String, String) = {
    def t(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (repsT, outT) = (t("ssi_reps"), t("ssi_out"))
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    TxLogTable.create(spark, repsT,
      Dedup.cellRepresentatives(empty, centroids, "vec_id", "embedding").schema)
    TxLogTable.create(spark, outT, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("rep", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("drop_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cos", org.apache.spark.sql.types.DoubleType))))
    (repsT, outT)
  }

  // batch 1: one vector → cell 0's representative. batch 2: three
  // CO-ARRIVING near-copies land in empty cell 1 — the election picks
  // id 3 (exactly on the centroid), ids 2 and 4 collapse against it
  // in the same micro-batch. batch 3: a near-copy of cell 0's rep
  // (drops), plus a cell-1 member outside tau of the rep (admitted —
  // and per the pruned-regime contract NOT stored, so batch 4's
  // near-copy of IT is also admitted: the documented recall
  // tradeoff, not a bug).
  private val batches = Seq(
    Seq((1L, Seq(1.0, 0.0))),
    Seq((2L, Seq(0.1, 1.0)), (3L, Seq(0.0, 1.0)), (4L, Seq(0.14, 0.99))),
    Seq((10L, Seq(0.995, 0.1)), (11L, Seq(0.6, 0.8))),
    Seq((20L, Seq(0.62, 0.79))))

  // the sequential reference: the same Dedup ops applied batch-by-batch
  private def runReference(bs: Seq[Seq[(Long, Seq[Double])]],
      repsT: String, outT: String): Unit =
    for ((rows, i) <- bs.zipWithIndex) {
      val b = rows.toDF("vec_id", "embedding").localCheckpoint()
      val asg = Dedup.assignCellsWithDist(b, centroids, "vec_id", "embedding")
        .localCheckpoint()
      val reps = TxLogTable.read(spark, repsT)
      val cross = Dedup.semanticDupIncrementalFromAssignment(
        b, asg.select(col("vec_id"), col("cell")), reps, "vec_id", "embedding", TAU)
      val keptAsg = asg.join(cross.select(col("drop_id").as("vec_id")),
        Seq("vec_id"), "left_anti")
      val newCells = keptAsg.join(broadcast(reps.select("cell")), Seq("cell"), "left_anti")
      val newReps = newCells.groupBy("cell")
        .agg(min(struct(col("d2"), col("vec_id"))).as("__r"))
        .select(col("cell"), col("__r.vec_id").as("rep"))
        .join(b.select(col("vec_id").as("rep"), col("embedding").as("rep_vec")), "rep")
        .select("cell", "rep", "rep_vec").localCheckpoint()
      val inner = Dedup.semanticDupIncrementalFromAssignment(
        b, newCells.select(col("vec_id"), col("cell")), newReps,
        "vec_id", "embedding", TAU)
      TxLogTable.append(cross.unionAll(inner).localCheckpoint(),
        outT, Some(("ref-out", i.toLong)))
      TxLogTable.append(newReps, repsT, Some(("ref-reps", i.toLong)))
    }

  private def verdicts(outT: String): Set[(Long, Long, Long)] =
    TxLogTable.read(spark, outT).select("cell", "rep", "drop_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("stream verdicts equal the sequential batch composition; state stays O(k)") {
    val (rReps, rOut) = freshTables()
    runReference(batches, rReps, rOut)
    val expected = verdicts(rOut)
    // the contracts, pinned explicitly: co-arrivals 2 and 4 collapse
    // to the elected rep 3; 10 drops against stored rep 1; 11 and 20
    // are admitted (outside tau of their cell's rep — and 20 is NOT
    // matched against the unstored 11, the pruned-regime contract)
    assert(expected === Set((1L, 3L, 2L), (1L, 3L, 4L), (0L, 1L, 10L)))

    val (sReps, sOut) = freshTables()
    val ckpt = java.nio.file.Files.createTempDirectory("ssi_ck").toString
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = StreamingOps.semanticDedupIngest(
      ms.toDF.toDF("vec_id", "embedding"), centroids, sReps, sOut, "ssi", ckpt,
      tau = TAU)
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    assert(verdicts(sOut) === expected)
    // O(k) state: exactly one row per non-empty cell, the elected reps
    val reps = TxLogTable.read(spark, sReps).select("cell", "rep")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reps === Set((0L, 1L), (1L, 3L)))
    // replay idempotence: re-appending under an already-committed txn
    // tag no-ops on both tables
    val outBefore = TxLogTable.read(spark, sOut).count()
    val repsBefore = TxLogTable.read(spark, sReps).count()
    TxLogTable.append(
      Seq((0L, 1L, 99L, 1.0)).toDF("cell", "rep", "drop_id", "cos"),
      sOut, Some(("ssi-out", (batches.length - 1).toLong)))
    TxLogTable.append(
      Seq((7L, 99L, Seq(1.0, 1.0))).toDF("cell", "rep", "rep_vec"),
      sReps, Some(("ssi-reps", (batches.length - 1).toLong)))
    assert(TxLogTable.read(spark, sOut).count() === outBefore)
    assert(TxLogTable.read(spark, sReps).count() === repsBefore)
  }

  test("within-batch representative election is order-free") {
    // the same co-arrival batch, permuted: identical verdicts and rep
    val perm = Seq(
      batches.head,
      Seq((4L, Seq(0.14, 0.99)), (2L, Seq(0.1, 1.0)), (3L, Seq(0.0, 1.0))))
    val (aReps, aOut) = freshTables()
    runReference(batches.take(2), aReps, aOut)
    val (bReps, bOut) = freshTables()
    runReference(perm, bReps, bOut)
    assert(verdicts(aOut) === verdicts(bOut))
    val repOf = (t: String) => TxLogTable.read(spark, t)
      .filter(col("cell") === 1L).select("rep").as[Long].collect().toList
    assert(repOf(aReps) === List(3L) && repOf(bReps) === List(3L))
  }

  // ADVICE r16 follow-through: a duplicated id within one micro-batch
  // (at-least-once delivery) must elect ONE representative row — the
  // raw frame feeds the rep_vec join, so each copy would otherwise
  // duplicate the (cell, rep, rep_vec) state row.
  test("a duplicated id within one batch leaves one representative row") {
    val (sReps, sOut) = freshTables()
    val ckpt = java.nio.file.Files.createTempDirectory("ssi_ck3").toString
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = StreamingOps.semanticDedupIngest(
      ms.toDF.toDF("vec_id", "embedding"), centroids, sReps, sOut,
      "ssi3", ckpt, tau = TAU)
    try {
      ms.addData(Seq((1L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0))))
      q.processAllAvailable()
    } finally q.stop()
    val reps = TxLogTable.read(spark, sReps).select("cell", "rep")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(reps === List((0L, 1L))) // exactly one row, not two
    assert(TxLogTable.read(spark, sOut).isEmpty) // no self-drop
  }
}
