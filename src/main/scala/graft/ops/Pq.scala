package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization for embedding columns.
  *
  * The classic PQ recipe (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split each d-dim vector
  * into `m` contiguous subvectors of `d/m` dims, quantize every
  * subvector against a per-subspace codebook of `k` centroids, and
  * answer queries with asymmetric distance computation (ADC) — a
  * per-query lookup table of query-subvector → centroid squared
  * distances, so each database vector costs `m` table lookups + adds
  * instead of a d-dim float scan.
  *
  * Codebook choice here is the deterministic seeded variant: the
  * first `k` vectors by id ARE the codebook (one row per subspace).
  * A learned codebook (k-means per subspace — the machinery q142
  * already has) drops in by swapping [[codebook]]; the encode/ADC
  * plumbing is identical, and determinism is what lets the DuckDB
  * oracle recompute every code and distance bit-for-bit.
  *
  * Scale posture: the codebook is `m × k` rows (constant) and is
  * BROADCAST; encoding is then a map-side join + per-row argmin —
  * no shuffle at all over the corpus until the caller aggregates.
  * At 100 TB the codes table is ~m bytes/vector vs 4·d — a 32×
  * compression that makes the exhaustive ADC scan the baseline ANN
  * path, with IVF (q80) composing on top for sublinear probes.
  */
object Pq {

  /** Double-precision inner product of two float-array columns,
    * summed in index order (parity with DuckDB's list_inner_product
    * at oracle rounding).
    */
  def ip(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, x) -> acc + x)"

  /** One row per (vec_id, subspace j) with the double-cast subvector. */
  def subvectors(emb: DataFrame, m: Int, ds: Int): DataFrame =
    emb.select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("j"),
        col("embedding"))
      .withColumn("sv",
        expr(s"transform(slice(embedding, j * $ds + 1, $ds), x -> CAST(x AS DOUBLE))"))
      .select("vec_id", "j", "sv")

  /** The seeded codebook: subvectors of the first `k` ids, keyed
    * (c, j). Constant-size (m × k rows) — always broadcast.
    */
  def codebook(emb: DataFrame, m: Int, ds: Int, k: Int): DataFrame =
    subvectors(emb.filter(col("vec_id") < k), m, ds)
      .select(col("vec_id").as("c"), col("j").as("cj"), col("sv").as("cv"))

  /** One Lloyd refinement of the seeded codebook — the LEARNED
    * codebook (the full k-means loop is this step iterated; one
    * deterministic step is enough to separate "learned" from "seeded"
    * measurably, and each further step is the same plan). Assignment
    * is the broadcast argmin of [[encode]] (ties to the smallest
    * centroid id); the new centroid is the per-dimension mean of its
    * assigned subvectors through the DECIMAL(30,8) accumulator (exact
    * and order-insensitive, so both engines and any shuffle order
    * agree bit-for-bit); empty cells keep their seed. Cost at corpus
    * scale: one map-side argmin pass + a (m·k·ds)-group mean — the
    * shuffle carries k×dims partial sums, never vectors.
    */
  def learnedCodebook(emb: DataFrame, m: Int, ds: Int, k: Int): DataFrame = {
    val cb = codebook(emb, m, ds, k)
    val assigned = subvectors(emb, m, ds)
      .join(broadcast(cb), col("j") === col("cj"))
      .withColumn("d2",
        expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"))
      .groupBy("vec_id", "j")
      .agg(min(struct(col("d2"), col("c"), col("sv"))).as("best"))
      .select(col("j"), col("best.c").as("c"), col("best.sv").as("sv"))
    val means = assigned
      .select(col("j"), col("c"), posexplode(col("sv")).as(Seq("pos", "val")))
      .groupBy("j", "c", "pos")
      .agg((sum(col("val").cast(org.apache.spark.sql.types.DecimalType(30, 8)))
        .cast(org.apache.spark.sql.types.DoubleType) / count(lit(1))).as("mv"))
    val rebuilt = means.groupBy(col("j").as("lj"), col("c").as("lc"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
        s => s.getField("mv")).as("lcv"))
    cb.join(rebuilt, col("cj") === col("lj") && col("c") === col("lc"), "left")
      .select(col("c"), col("cj"), coalesce(col("lcv"), col("cv")).as("cv"))
  }

  /** PQ codes against an explicit codebook (cols c, cj, cv): one row
    * per (vec_id, j) with the argmin centroid id. Ties break to the
    * smallest centroid id (struct min orders by distance first, then
    * id). Map-only over the corpus: broadcast codebook join +
    * per-row reduce, no corpus shuffle.
    */
  def encodeWith(emb: DataFrame, m: Int, ds: Int, cb: DataFrame): DataFrame =
    subvectors(emb, m, ds)
      .join(broadcast(cb), col("j") === col("cj"))
      .withColumn("d2",
        expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"))
      .groupBy("vec_id", "j")
      .agg(min(struct(col("d2"), col("c"))).as("best"))
      .select(col("vec_id"), col("j"), col("best.c").as("code"))

  /** [[encodeWith]] against the seeded codebook. */
  def encode(emb: DataFrame, m: Int, ds: Int, k: Int): DataFrame =
    encodeWith(emb, m, ds, codebook(emb, m, ds, k))

  /** ADC lookup table for one query vector against an explicit
    * codebook: (j, c) → squared L2 between the query's j-th subvector
    * and centroid c. Computed as qq − 2qc + cc from inner products
    * (same decomposition the oracle uses, so the doubles agree at
    * oracle rounding). m × k rows — broadcast by every consumer.
    */
  def adcLutWith(emb: DataFrame, m: Int, ds: Int, cb: DataFrame,
      queryVecId: Long): DataFrame = {
    val q = subvectors(emb.filter(col("vec_id") === queryVecId), m, ds)
      .select(col("j").as("qj"), col("sv").as("qv"))
    cb.join(q, col("cj") === col("qj"))
      .withColumn("d2",
        expr(ip("qv", "qv")) - lit(2.0) * expr(ip("qv", "cv")) + expr(ip("cv", "cv")))
      .select(col("cj").as("j"), col("c"), col("d2"))
  }

  /** [[adcLutWith]] against the seeded codebook. */
  def adcLut(emb: DataFrame, m: Int, ds: Int, k: Int, queryVecId: Long): DataFrame =
    adcLutWith(emb, m, ds, codebook(emb, m, ds, k), queryVecId)

  /** ADC top-k: approximate nearest neighbours of `queryVecId` by
    * summed per-subspace table lookups over the codes. The scan is
    * codes ⋈ broadcast(LUT) + a groupBy(vec_id) sum — the cheap
    * exhaustive pass PQ exists for.
    */
  def adcTopK(emb: DataFrame, m: Int, ds: Int, k: Int,
      queryVecId: Long, topK: Int): DataFrame = {
    val enc = encode(emb, m, ds, k)
    val lut = adcLut(emb, m, ds, k, queryVecId)
    enc.filter(col("vec_id") >= k && col("vec_id") =!= queryVecId)
      .join(broadcast(lut), Seq("j"), "inner")
      .filter(col("code") === col("c"))
      .groupBy("vec_id")
      .agg(sum(col("d2")).as("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(topK)
  }

  /** Full-vector double cast, for the coarse (IVF) quantizer. */
  private def fullVec(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  /** The IVF coarse centroid frame: `nlist` full-dimension vectors
    * (ids `coarseBase until coarseBase+nlist`) keyed by cell id.
    * Constant-size — always broadcast. Incremental pipelines FREEZE
    * this frame at index-build time ([[coarseAssignWith]]).
    */
  def coarseCentroids(emb: DataFrame, nlist: Int, coarseBase: Long): DataFrame =
    fullVec(emb.filter(col("vec_id") >= coarseBase &&
        col("vec_id") < coarseBase + nlist))
      .select((col("vec_id") - coarseBase).as("cell"), col("v").as("cv"))

  /** IVF coarse assignment against an EXPLICIT centroid frame
    * (cols cell, cv): nearest centroid by full-dimension L2, ties to
    * the smaller cell. Broadcast-argmin like [[encode]] — map-only
    * over the corpus, so an arriving ingest batch assigns in
    * O(batch) against frozen centroids.
    */
  def coarseAssignWith(emb: DataFrame, cc: DataFrame): DataFrame =
    fullVec(emb).crossJoin(broadcast(cc))
      .withColumn("d2",
        expr("aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cell"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"))

  /** IVF coarse assignment deriving the centroids from the frame's
    * own id range — the batch form ([[coarseAssignWith]] over
    * [[coarseCentroids]]). */
  def coarseAssign(emb: DataFrame, nlist: Int, coarseBase: Long): DataFrame =
    coarseAssignWith(emb, coarseCentroids(emb, nlist, coarseBase))

  /** IVF-PQ top-k FROM STORED STATE — the query side of the
    * INCREMENTAL ANN index ([[lshDupIncremental]]'s analog for
    * similarity search). State between ingest batches: the codes
    * table (vec_id, j, code — [[encodeWith]]), the cells table
    * (vec_id, cell — [[coarseAssignWith]]), and the FROZEN codebook
    * + coarse centroid frames they were built against (constant-
    * size; retrained offline, never per batch — the standard IVF-PQ
    * deployment contract). An arriving corpus batch extends the
    * state by encoding/assigning ONLY itself against the frozen
    * frames (O(batch) map-side work, zero seen-vector re-reads);
    * a query then probes the STORED tables: nprobe nearest cells by
    * broadcast argmin over the centroid frame, candidates from the
    * cells table by one hash join, ranking by ADC lookups over the
    * codes table — per-query cost proportional to the probed
    * cells' populations, independent of how many batches built the
    * state. `query` is ONE (vec_id, embedding) row — it need not
    * belong to the indexed corpus; its id only excludes a self-
    * match. Candidates below `minCandId` (the codebook/centroid id
    * range) are excluded, as in [[ivfAdcTopK]].
    */
  def ivfAdcTopKFromState(codes: DataFrame, cells: DataFrame,
      cb: DataFrame, cc: DataFrame, query: DataFrame, m: Int, ds: Int,
      nprobe: Int, topK: Int, minCandId: Long): DataFrame = {
    val qsub = subvectors(query, m, ds).select(col("j").as("qj"), col("sv").as("qv"))
    val lut = cb.join(broadcast(qsub), col("cj") === col("qj"))
      .withColumn("d2",
        expr(ip("qv", "qv")) - lit(2.0) * expr(ip("qv", "cv")) + expr(ip("cv", "cv")))
      .select(col("cj").as("j"), col("c"), col("d2"))
    val probed = fullVec(query).crossJoin(broadcast(cc))
      .withColumn("qd2",
        expr("aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"))
      .orderBy(col("qd2"), col("cell"))
      .limit(nprobe)
      .select("cell")
    val qid = query.select(col("vec_id").as("__qid"))
    val cand = cells.filter(col("vec_id") >= minCandId)
      .join(broadcast(probed), Seq("cell"))
      .join(broadcast(qid), col("vec_id") === col("__qid"), "left_anti")
    codes.join(cand, Seq("vec_id"))
      .join(broadcast(lut), Seq("j"), "inner")
      .filter(col("code") === col("c"))
      .groupBy("vec_id", "cell")
      .agg(sum(col("d2")).as("adc_d2"))
      .select(col("vec_id"),
        col("cell").cast(org.apache.spark.sql.types.LongType).as("cell"),
        col("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(topK)
  }

  /** Fold one change-feed window of the base embeddings TxLog table
    * into the STORED ANN index — the maintenance half of the
    * incremental IVF-PQ ([[ivfAdcTopKFromState]] is the query half).
    * Inserted vectors encode ([[encodeWith]]) and assign
    * ([[coarseAssignWith]]) against the FROZEN codebook/centroid
    * frames — O(changes) map-side work, zero seen-vector re-reads —
    * and APPEND to the codes/cells tables stamped with their commit
    * version; deleted ids append (vec_id, v) TOMBSTONES. Nothing
    * stored is ever rewritten (the dedup family's append-only state
    * discipline: at 100 TB a retention delete must not rewrite the
    * codes table); [[liveState]] reconstructs the current view
    * version-aware, so a vector deleted and later re-ingested
    * resolves to its NEWEST codes, never its tombstoned ones. All
    * three appends are txn-tagged (appId-table, window end), so a
    * replayed maintenance window no-ops on every table.
    */
  def applyChangesToIndex(spark: org.apache.spark.sql.SparkSession,
      baseTable: String, fromV: Long, toV: Long,
      cb: DataFrame, cc: DataFrame, m: Int, ds: Int,
      codesTable: String, cellsTable: String, tombTable: String,
      appId: String): Unit = {
    import graft.sink.TxLogTable
    val feed = TxLogTable.changes(spark, baseTable, fromV, toV)
    val ins = feed.filter(col("_change_type") === "insert")
      .select(col("vec_id"), col("embedding"), col("_commit_version").as("v"))
      .transform(Pinned.pin)
    val ver = ins.select(col("vec_id"), col("v"))
    TxLogTable.append(
      encodeWith(ins, m, ds, cb).join(broadcast(ver), Seq("vec_id")),
      codesTable, Some((s"$appId-codes", toV)))
    TxLogTable.append(
      coarseAssignWith(ins, cc).join(broadcast(ver), Seq("vec_id")),
      cellsTable, Some((s"$appId-cells", toV)))
    TxLogTable.append(
      feed.filter(col("_change_type") === "delete")
        .select(col("vec_id"), col("_commit_version").as("v")),
      tombTable, Some((s"$appId-tomb", toV)))
    Pinned.release(ins)
    ()
  }

  /** Current view of an append-only versioned state table against its
    * tombstones: a row survives iff no tombstone for its id is as new
    * as it. O(state) with the tombstone aggregate broadcast-or-hash
    * joined — never a rewrite of the state.
    */
  def liveState(state: DataFrame, tomb: DataFrame): DataFrame = {
    val tm = tomb.groupBy("vec_id").agg(max(col("v")).as("__tv"))
    state.join(tm, Seq("vec_id"), "left")
      .filter(col("__tv").isNull || col("v") > col("__tv"))
      .drop("__tv")
  }

  /** IVF-PQ (non-residual form): the coarse quantizer routes the
    * query to its `nprobe` nearest inverted lists, and only vectors
    * in those cells are ranked — by PQ ADC lookups, never a raw
    * float scan. At scale this is the standard two-level ANN layout:
    * the cell id is a partitioning key (each probe touches ~nprobe /
    * nlist of the corpus), and the per-vector cost inside a probed
    * cell is m byte-lookups. Candidates start above the id range the
    * codebooks occupy.
    */
  def ivfAdcTopK(emb: DataFrame, m: Int, ds: Int, k: Int,
      nlist: Int, coarseBase: Long, queryVecId: Long,
      nprobe: Int, topK: Int): DataFrame = {
    val cc = fullVec(emb.filter(col("vec_id") >= coarseBase &&
        col("vec_id") < coarseBase + nlist))
      .select((col("vec_id") - coarseBase).as("cell"), col("v").as("cv"))
    // nprobe nearest cells for the query — nlist rows, driver-free
    val probed = fullVec(emb.filter(col("vec_id") === queryVecId))
      .crossJoin(broadcast(cc))
      .withColumn("d2",
        expr("aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"))
      .orderBy(col("d2"), col("cell"))
      .limit(nprobe)
      .select("cell")
    val cand = coarseAssign(emb, nlist, coarseBase)
      .filter(col("vec_id") >= coarseBase + nlist &&
        col("vec_id") =!= queryVecId) // a self-match is never an answer
      .join(broadcast(probed), Seq("cell"))
    val enc = encode(emb, m, ds, k)
    val lut = adcLut(emb, m, ds, k, queryVecId)
    enc.join(cand, Seq("vec_id"))
      .join(broadcast(lut), Seq("j"), "inner")
      .filter(col("code") === col("c"))
      .groupBy("vec_id", "cell")
      .agg(sum(col("d2")).as("adc_d2"))
      .select(col("vec_id"), col("cell").cast(org.apache.spark.sql.types.LongType).as("cell"),
        col("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(topK)
  }
}
