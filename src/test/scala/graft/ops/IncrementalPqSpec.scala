package graft.ops

import graft.SparkSpec
import graft.sink.TxLogTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental IVF-PQ ANN state (`Pq.applyChangesToIndex` +
  * `Pq.liveState` + `Pq.ivfAdcTopKFromState`): the stored
  * codes/cells tables are maintained off the base table's CHANGE
  * FEED — inserts encode in O(changes) against the frozen
  * codebook/centroid frames, deletes append version-stamped
  * tombstones, nothing stored is ever rewritten — and the
  * maintained view must equal a from-scratch batch re-encode of the
  * final snapshot exactly (the q235 matview discipline applied to
  * the ANN index). Query-side, the stored-state probe must match
  * the batch op and keep a plan whose shape does not grow with the
  * seen-corpus row count.
  */
class IncrementalPqSpec extends SparkSpec {
  import spark.implicits._

  private val (m, ds, k, nlist, coarseBase) = (4, 16, 8, 4, 8L)

  /** Deterministic 64-dim float embeddings for a given id range. */
  private def embOf(ids: Seq[Long]): DataFrame =
    ids.toDF("vec_id").selectExpr("vec_id",
      "transform(sequence(0, 63), i -> " +
        "CAST((vec_id * 31 + i * 17) % 97 AS FLOAT)) AS embedding")

  test("CDF-maintained index equals the batch re-encode of the final snapshot") {
    def t(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (baseT, codesT, cellsT, tombT) = (t("pq_base"), t("pq_codes"),
      t("pq_cells"), t("pq_tomb"))
    val v1 = embOf(0L until 40L)
    TxLogTable.create(spark, baseT, v1.schema)
    TxLogTable.append(v1, baseT) // v1... actually version 2 (create=1)
    val baseV1 = TxLogTable.read(spark, baseT)
    // frozen quantizers, built once from the first snapshot
    val cb = Pq.codebook(baseV1, m, ds, k).localCheckpoint()
    val cc = Pq.coarseCentroids(baseV1, nlist, coarseBase).localCheckpoint()
    val withV = (df: DataFrame, v: Long) => df.withColumn("v", lit(v))
    TxLogTable.create(spark, codesT,
      withV(Pq.encodeWith(baseV1, m, ds, cb), 0L).schema)
    TxLogTable.create(spark, cellsT,
      withV(Pq.coarseAssignWith(baseV1, cc), 0L).schema)
    TxLogTable.create(spark, tombT,
      Seq.empty[(Long, Long)].toDF("vec_id", "v").schema)
    val commits0 = 0L
    var applied = TxLogTable.versions(spark, baseT).max
    // window 1: the initial snapshot arrives through the feed too —
    // the maintenance loop has ONE code path, no special init
    Pq.applyChangesToIndex(spark, baseT, commits0, applied,
      cb, cc, m, ds, codesT, cellsT, tombT, "pqspec")
    // window 2: append 20 more + delete a slice (including id 28)
    TxLogTable.append(embOf(40L until 60L), baseT)
    val v3 = TxLogTable.delete(spark, baseT, "vec_id % 7 = 0 AND vec_id >= 24")
    Pq.applyChangesToIndex(spark, baseT, applied, v3,
      cb, cc, m, ds, codesT, cellsT, tombT, "pqspec")
    applied = v3
    // window 3: RE-INGEST a previously deleted id — the live view
    // must resolve to its newest codes, not its tombstone
    val v4 = TxLogTable.append(embOf(Seq(28L)), baseT)
    Pq.applyChangesToIndex(spark, baseT, applied, v4,
      cb, cc, m, ds, codesT, cellsT, tombT, "pqspec")

    def codesSet(df: DataFrame): Set[(Long, Long, Long)] =
      df.select(col("vec_id"), col("j").cast("long"), col("code").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val live = Pq.liveState(TxLogTable.read(spark, codesT),
      TxLogTable.read(spark, tombT))
    val batch = Pq.encodeWith(TxLogTable.read(spark, baseT), m, ds, cb)
    assert(codesSet(live) === codesSet(batch))
    assert(codesSet(live).exists(_._1 == 28L), "re-ingested id must be live")
    assert(!codesSet(live).exists(_._1 == 35L), "deleted id must stay dead")
    val liveCells = Pq.liveState(TxLogTable.read(spark, cellsT),
      TxLogTable.read(spark, tombT))
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchCells = Pq.coarseAssignWith(TxLogTable.read(spark, baseT), cc)
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(liveCells === batchCells)

    // replayed maintenance window: txn tags no-op every append
    val before = (TxLogTable.read(spark, codesT).count(),
      TxLogTable.read(spark, cellsT).count(),
      TxLogTable.read(spark, tombT).count())
    Pq.applyChangesToIndex(spark, baseT, v3, v4,
      cb, cc, m, ds, codesT, cellsT, tombT, "pqspec")
    val after = (TxLogTable.read(spark, codesT).count(),
      TxLogTable.read(spark, cellsT).count(),
      TxLogTable.read(spark, tombT).count())
    assert(after === before, "replayed window must no-op on all tables")
  }

  test("stored-state probe equals the batch op exactly") {
    val emb = embOf(0L until 60L)
    val cb = Pq.codebook(emb, m, ds, k).localCheckpoint()
    val cc = Pq.coarseCentroids(emb, nlist, coarseBase).localCheckpoint()
    val codes = Pq.encodeWith(emb, m, ds, cb).localCheckpoint()
    val cells = Pq.coarseAssignWith(emb, cc).localCheckpoint()
    val got = Pq.ivfAdcTopKFromState(codes, cells, cb, cc,
        emb.filter(col("vec_id") === 59L), m, ds,
        nprobe = 2, topK = 5, minCandId = coarseBase + nlist)
      .collect().map(_.toString).toSeq
    val expected = Pq.ivfAdcTopK(emb, m, ds, k, nlist, coarseBase,
        queryVecId = 59L, nprobe = 2, topK = 5)
      .collect().map(_.toString).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("probe plan is INDEPENDENT of the seen-corpus size") {
    def stateOf(n: Long): (DataFrame, DataFrame, DataFrame, DataFrame) = {
      val emb = spark.range(n).selectExpr("id AS vec_id",
        "transform(sequence(0, 63), i -> " +
          "CAST((id * 31 + i * 17) % 97 AS FLOAT)) AS embedding")
      val cb = Pq.codebook(emb, m, ds, k).localCheckpoint()
      val cc = Pq.coarseCentroids(emb, nlist, coarseBase).localCheckpoint()
      (Pq.encodeWith(emb, m, ds, cb).localCheckpoint(),
        Pq.coarseAssignWith(emb, cc).localCheckpoint(), cb, cc)
    }
    val query = embOf(Seq(1000000L))
    def shape(st: (DataFrame, DataFrame, DataFrame, DataFrame)): String =
      Pq.ivfAdcTopKFromState(st._1, st._2, st._3, st._4, query, m, ds,
          nprobe = 2, topK = 5, minCandId = coarseBase + nlist)
        .queryExecution.optimizedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("\\bid=#x\\b", "")
    assert(shape(stateOf(40L)) === shape(stateOf(4000L)))
  }
}
