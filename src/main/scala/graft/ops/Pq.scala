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

  /** IVF coarse assignment: nearest of `nlist` centroids (the vectors
    * with ids `coarseBase until coarseBase+nlist`), full-dimension L2,
    * ties to the smaller cell. Broadcast-argmin like [[encode]] —
    * map-only over the corpus.
    */
  def coarseAssign(emb: DataFrame, nlist: Int, coarseBase: Long): DataFrame = {
    val cc = fullVec(emb.filter(col("vec_id") >= coarseBase &&
        col("vec_id") < coarseBase + nlist))
      .select((col("vec_id") - coarseBase).as("cell"), col("v").as("cv"))
    fullVec(emb).crossJoin(broadcast(cc))
      .withColumn("d2",
        expr("aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cell"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"))
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
      .filter(col("vec_id") >= coarseBase + nlist)
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
