package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector-similarity operators over `array<float>` embedding columns.
  *
  * All math is done in DOUBLE with a sequential left-to-right fold
  * (`aggregate` over `zip_with`) so results are bit-reproducible across
  * engines and partitionings.
  *
  * Scale design: brute-force top-k is the correctness baseline — a
  * broadcast of the query vector against a full scan (embarrassingly
  * parallel, no shuffle; `TakeOrderedAndProject` keeps only k rows per
  * partition). The sign-LSH bucket variant is the scale path: a
  * deterministic hyperplane-sign bucket key turns ANN into an equi-join
  * / partition-pruned scan touching 1/2^bits of the corpus.
  */
object Similarity {

  /** Cast array<float> → array<double> for stable math. */
  def asDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Dot product via zip_with + sequential fold (codegen'd built-ins). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; null on zero-norm input.
    * Composed-builtin form — semantically identical to the native
    * `graft.functions.VectorExprs.cosineSim`, which the operators below
    * use instead: higher-order-function lambdas evaluate interpreted
    * (no codegen), ~50x slower per pair on 64-dim vectors.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Native codegen'd cosine (bit-identical to `cosine`). */
  private def cos(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  /** Brute-force cosine top-k against one query vector.
    * The single-row query frame is broadcast; Catalyst plans
    * BroadcastNestedLoopJoin + TakeOrderedAndProject — one scan, no
    * shuffle of the corpus.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryVecId: Long,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryVecId)
      .select(col(vecCol).as("__qv"))
    embeddings
      .filter(col(idCol) =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cos(col(vecCol), col("__qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic sign-LSH bucket key: one bit per leading dimension
    * (random-hyperplane LSH with axis-aligned planes — deterministic so
    * any engine reproduces the same buckets). 2^bits buckets.
    */
  def signBucket(vec: Column, bits: Int): Column =
    concat_ws("", (1 to bits).map(i =>
      when(element_at(vec, i) > 0f, "1").otherwise("0")): _*)

  /** Count-derived [[signBucket]] width: ceil-log2(n / targetBucket),
    * clamped to [4, 16] — buckets hold ~targetBucket vectors at ANY
    * corpus size, so per-bucket pair/candidate work stays flat where a
    * pinned width goes quadratic (the round-9 64× probes: 15-40 s).
    * Pure-integer arithmetic (ceil-div, then binary digit count of
    * m-1) so a SQL oracle reproduces the width exactly — no float
    * log2 half-cases; [[derivedBitsSql]] is the DuckDB mirror. The
    * ONE definition both engine and oracle reference: retune
    * targetBucket or the clamp here and nowhere else.
    */
  def derivedBits(n: Long, targetBucket: Long = 64L): Int = {
    val m = (n + targetBucket - 1) / targetBucket
    math.min(16, math.max(4,
      if (m <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1L)))
  }

  /** DuckDB scalar subquery mirroring [[derivedBits]] over `tbl`'s
    * row count (LENGTH(BIN(m-1)) = binary digit count = ceil-log2).
    * Splice as `WITH p AS (<fragment>)` and read `(SELECT bits FROM p)`.
    */
  def derivedBitsSql(tbl: String, targetBucket: Long = 64L): String =
    s"""SELECT GREATEST(4, LEAST(16, LENGTH(BIN(CAST(
       |  ((COUNT(*) + ${targetBucket - 1}) // $targetBucket) - 1 AS BIGINT))))) AS bits
       |FROM $tbl""".stripMargin

  /** ANN via LSH bucket: search only the query vector's bucket —
    * the IVF-style scale path (probes 1/2^bits of the corpus; recall
    * traded for a 2^bits scan reduction; multi-probe = relax the
    * bucket equality to Hamming-adjacent keys).
    */
  def annTopKInBucket(
      embeddings: DataFrame,
      queryVecId: Long,
      k: Int,
      bits: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val withBucket = embeddings.withColumn("__bucket", signBucket(col(vecCol), bits))
    val q = withBucket.filter(col(idCol) === queryVecId)
      .select(col("__bucket"), col(vecCol).as("__qv"))
    withBucket
      .filter(col(idCol) =!= queryVecId)
      .join(broadcast(q), "__bucket")
      .select(col(idCol), cos(col(vecCol), col("__qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Multi-probe ANN: search the query's bucket plus every bucket at
    * Hamming distance 1 (one sign bit flipped) — recovers most of the
    * recall single-probe loses to boundary vectors while still
    * scanning only (bits+1)/2^bits of the corpus. The probe-key set
    * is generated on the one-row query side and broadcast; the corpus
    * side remains a plain equi-join on the bucket key (each corpus
    * row matches at most one probe key, so no dedup is needed).
    */
  def annTopKMultiProbe(
      embeddings: DataFrame,
      queryVecId: Long,
      k: Int,
      bits: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val withBucket = embeddings.withColumn("__bucket", signBucket(col(vecCol), bits))
    val q = withBucket.filter(col(idCol) === queryVecId)
      .select(col("__bucket").as("__qb"), col(vecCol).as("__qv"))
    val flips = (1 to bits).map { i =>
      concat(
        substring(col("__qb"), 1, i - 1),
        when(substring(col("__qb"), i, 1) === "1", "0").otherwise("1"),
        substring(col("__qb"), i + 1, bits - i))
    }
    val probes = q.select(explode(array(col("__qb") +: flips: _*)).as("__bucket"),
      col("__qv"))
    withBucket
      .filter(col(idCol) =!= queryVecId)
      .join(broadcast(probes), "__bucket")
      .select(col(idCol), cos(col(vecCol), col("__qv")).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs near-duplicate detection above a cosine threshold,
    * blocked by an id-range bucket so the join stays an equi-join
    * (at full scale the blocking key is the LSH bucket; the id-range
    * block here keeps the oracle SQL-expressible).
    */
  def nearDupPairsBlocked(
      embeddings: DataFrame,
      threshold: Double,
      blockSize: Long = 100L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val withBlock = embeddings.select(
      col(idCol), col(vecCol).as("__v"),
      floor(col(idCol) / blockSize).as("__blk"))
    val a = withBlock.select(col("__blk"), col(idCol).as("id1"), col("__v").as("v1"))
    val b = withBlock.select(col("__blk"), col(idCol).as("id2"), col("__v").as("v2"))
    a.join(b, Seq("__blk"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cos(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Hard-negative mining for contrastive training: for each anchor
    * row (caller-supplied predicate), the top-k most-similar vectors
    * with a DIFFERENT class label, blocked by the sign-LSH bucket.
    *
    * Scale contract: with FIXED `bits` the per-bucket population — and
    * so the candidate pair count — grows quadratically with the
    * corpus (the q273 SemDeDup lesson). Size `bits` ~
    * log2(corpus / targetBucketSize) so buckets stay bounded and the
    * join stays linear; the gate query pins bits=4 for its oracle.
    */
  def hardNegatives(
      embeddings: DataFrame,
      anchorPred: Column,
      k: Int,
      bits: Int,
      idCol: String = "vec_id",
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = embeddings.select(
      col(idCol), col(labelCol), col(vecCol),
      signBucket(col(vecCol), bits).as("bucket"))
    val anchors = b.filter(anchorPred).select(
      col("bucket"), col(idCol).as("a_id"), col(labelCol).as("a_label"),
      col(vecCol).as("a_emb"))
    val cands = b.select(
      col("bucket"), col(idCol).as("c_id"), col(labelCol).as("c_label"),
      col(vecCol).as("c_emb"))
    val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("c_id"))
    anchors.join(cands, "bucket")
      .filter(col("c_label") =!= col("a_label"))
      .select(col("a_id"), col("a_label"), col("c_id"), col("c_label"),
        cos(col("a_emb"), col("c_emb")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("a_id", "rank", "c_id", "a_label", "c_label", "cos")
  }

  /** Near-duplicate pairs blocked by the sign-LSH bucket — the scale
    * form of [[nearDupPairsBlocked]]: the blocking key is derived from
    * the VECTOR (similar vectors collide), not from the id, so the
    * equi-join compares only plausibly-similar candidates and scans
    * ~1/2^bits of the pair space. Recall tradeoff: a pair straddling a
    * sign boundary is missed — raise recall with fewer bits or
    * multi-probe banding, exactly as in ANN search.
    */
  def nearDupPairsLsh(
      embeddings: DataFrame,
      threshold: Double,
      bits: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val withBucket = embeddings.select(
      col(idCol), col(vecCol).as("__v"),
      signBucket(col(vecCol), bits).as("__bucket"))
    val a = withBucket.select(col("__bucket"), col(idCol).as("id1"), col("__v").as("v1"))
    val b = withBucket.select(col("__bucket"), col(idCol).as("id2"), col("__v").as("v2"))
    a.join(b, Seq("__bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cos(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
