package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-preparation operators for LLM training-data pipelines:
  * chunking, decontamination, stratified sampling, duplicate-cluster
  * resolution, deterministic shuffling, and sequence packing.
  *
  * Scale design (the 100 TB contract):
  *  - Chunking is a per-row generator (sequence → explode → slice),
  *    fully codegen'd, no shuffle: output partitioning follows the
  *    scan.
  *  - Decontamination joins the corpus' n-gram set against the
  *    benchmark's — the benchmark side is tiny by construction
  *    (eval sets are thousands of docs), so it is broadcast and the
  *    corpus is never shuffled.
  *  - Sampling and shard assignment are pure map-side filters on a
  *    portable hash (md5) — deterministic under any partitioning, no
  *    sort, no shuffle, reproducible across engines and runs.
  *  - Duplicate-cluster resolution is iterative min-label
  *    propagation — O(component diameter) rounds; near-dup clusters
  *    from LSH have tiny diameters, so 3-5 rounds converge at any
  *    scale. Each round is one equi-join + one partial-agg'd groupBy;
  *    lineage is cut per round (localCheckpoint) so plans stay flat.
  *  - Packing and shuffling use per-key windows / range-partitioned
  *    sort — never a single-partition global window.
  */
object Corpus {

  /** Fixed-size token-window chunks with stride (overlap = size-stride):
    * the standard context-window preparation step. Emits one row per
    * chunk with its token count and content hash.
    *
    * Per-row generator: `sequence` builds the chunk-start list,
    * `explode` fans out, `slice` takes the window — all codegen'd
    * built-ins, no lambda HOFs, no shuffle.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens >= stride, s"bad chunk geometry $chunkTokens/$stride")
    val toks = split(col(textCol), " ")
    docs
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        explode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(stride)))
          .as("__start"),
        col("__toks"))
      .select(
        col(idCol),
        (col("__start") / stride).cast(LongType).as("chunk_id"),
        least(lit(chunkTokens), size(col("__toks")) - col("__start"))
          .cast(LongType).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkTokens))))
          .as("chunk_md5"))
  }

  /** Benchmark decontamination (the n-gram overlap check run before
    * training): flags every corpus document sharing at least one
    * word n-gram with the benchmark set, with the overlap count and
    * the smallest matching benchmark doc id as evidence.
    *
    * The benchmark n-gram set is broadcast — eval sets are orders of
    * magnitude smaller than the corpus, so the corpus side never
    * shuffles for the join; the per-doc rollup groups on the already
    * doc-partitioned stream.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusGrams = corpus.select(col(idCol),
      explode(Dedup.shingles(col(textCol), n)).as("gram"))
    val benchGrams = benchmark.select(col(idCol).as("bench_id"),
      explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    corpusGrams
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        min(col("bench_id")).as("first_bench_id"))
  }

  /** [[decontaminate]] with a Bloom-filter pre-filter on the corpus
    * side — the shape that holds at 100 TB. The benchmark n-gram set
    * is first folded into a Bloom filter (one pass over the small
    * side), broadcast, and applied as a scan-side filter on the
    * exploded corpus grams BEFORE the confirm join: ~99% of corpus
    * grams are discarded at the scan (fpp-bounded), so join input
    * volume drops by orders of magnitude. Because Bloom filters have
    * no false negatives and every surviving gram is re-checked by the
    * exact broadcast join, the result is IDENTICAL to the exact
    * [[decontaminate]] — the filter only prunes, never decides.
    * (Same pattern as Spark's own runtime row-level bloom pruning for
    * shuffle joins, applied explicitly so it also works when the
    * gram-explosion sits between scan and join.)
    */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int,
      expectedGrams: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val benchGrams = benchmark.select(col(idCol).as("bench_id"),
      explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    val bloom = benchGrams.select(xxhash64(col("gram")).as("h"))
      .stat.bloomFilter("h", expectedGrams, fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out); out.toByteArray
    }
    // Native codegen predicate (Catalyst's own runtime-bloom-join
    // expression) over the serialized filter literal — no scalar UDF,
    // stays inside whole-stage codegen. Keys are xxhash64(gram) on
    // both build and probe sides, matching Spark's runtime filters.
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftshim.ColumnShim
    val mightContain = ColumnShim.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnShim.expression(xxhash64(col("gram")))))
    corpus
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .filter(mightContain)
      .join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_shared_grams"),
        min(col("bench_id")).as("first_bench_id"))
  }

  /** Deterministic stratified sampling: keep a per-stratum fraction
    * decided by the first hex nibble of md5(stratum:id) — a pure
    * map-side filter, reproducible across engines, runs, and
    * partitionings (no RNG state, no sort). `nibbleCeil` maps a
    * stratum to the exclusive upper nibble: 8 → 50%, 4 → 25%, ...
    */
  def sampleFlag(stratum: Column, id: Column, nibbleCeil: Column): Column =
    substring(md5(concat(stratum, lit(":"), id.cast(StringType))), 1, 1) < nibbleCeil

  /** Duplicate-cluster resolution: connected components over a
    * candidate-pair edge list, labels = min doc id per component
    * (the canonical representative every group member dedups to).
    *
    * Iterative min-label propagation: each round joins labels to the
    * (bidirected) edge list, takes the min neighbor label per node,
    * and stops at fixpoint. Rounds = component diameter; LSH dup
    * clusters are near-cliques, so this converges in a handful of
    * rounds no matter the corpus size. Lineage is cut every round so
    * the plan does not grow with iterations; each superseded round's
    * checkpoint is released as soon as the next one is materialized —
    * only the FINAL label frame stays pinned, backing the returned
    * frame (caller-owned, see [[Pinned]]).
    *
    * Convergence detection rides the round's own pin (round 16): the
    * per-node `__changed` flag (new label strictly below the old — the
    * only move min-propagation can make) is counted by an accumulator
    * inside the SAME job that materializes the next label frame
    * ([[Pinned.pinWithChangedCount]], round 17), so the fixpoint
    * check costs zero extra jobs. Barriers are this operator's
    * real latency shape: under AQE every exchange materializes as its
    * own Spark JOB, and a stall window on the host is sampled
    * serially by each of them (the q150 official-spike diagnosis —
    * SCALE.md round 16).
    *
    * AQE routing (round 17): on a SMALL graph (measured edge count on
    * the pin, node-sized state) the loop runs with adaptive execution
    * OFF — each round's join+agg+pin then executes as ONE classic
    * multi-stage job instead of one job per AQE query stage, cutting
    * the loop's scheduler-barrier count ~4×; AQE buys nothing there
    * (the frames are far below any skew/broadcast re-plan threshold)
    * and each barrier is a serial sample of any host stall window.
    * Above the threshold — the 100 TB regime — AQE stays ON for the
    * loop: per-round skew handling and runtime join re-planning are
    * worth the barriers when a round shuffles real data. The
    * threshold is set where classic execution's worst case stays
    * trivial: without AQE the static planner cannot see that the
    * label frame is node-sized (checkpoint stats are opaque), so the
    * per-round join may SMJ and re-shuffle the edge list each round —
    * at 4M edges that is ~64 MB/round, noise; at 50M+ it would not
    * be, so those graphs keep AQE's runtime broadcast of the labels.
    *
    * CONCURRENCY CONTRACT: the small-graph route toggles SESSION
    * confs (adaptive, shuffle partitions) for the loop's duration and
    * restores them in a finally — any OTHER query planned on the same
    * SparkSession while the loop runs would be planned under the
    * altered confs. Callers are single-query-at-a-time (Verify/Bench
    * run sequentially; the streaming ingests never call this); a
    * caller that needs concurrent planning must hand this operator a
    * frame from `spark.newSession()` so the conf scope is private.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20,
      smallGraphMaxEdges: Long = 4L * 1000 * 1000): DataFrame = {
    val fwd = pairs.select(col("id1").as("src"), col("id2").as("dst"))
    // the routing count rides the pin's own materializing job
    // ([[Pinned.pinWithCount]]) — one barrier, not two
    val (edges, nEdges) = Pinned.pinWithCount(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))))
    val spark = pairs.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val shufKey = "spark.sql.shuffle.partitions"
    val aqePrev = spark.conf.getOption(aqeKey)
    val shufPrev = spark.conf.getOption(shufKey)
    val small = nEdges <= smallGraphMaxEdges
    if (small) {
      spark.conf.set(aqeKey, "false")
      // AQE-off also loses post-shuffle coalescing — size the loop's
      // shuffles by the measured edge count (~16 B/edge, ≥64 MB per
      // partition target) instead of paying 32 near-empty tasks per
      // exchange on a node-sized frame
      val parts = math.max(1L, math.min(32L, nEdges * 16L / (64L << 20))).toInt
      spark.conf.set(shufKey, parts.toString)
    }
    try {
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .withColumn("__changed", lit(false))
      .transform(graft.ops.Pinned.pin)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // min neighbor label per node: every node appears as a dst of
      // the bidirected edge list, so the aggregate covers all of them
      // (the coalesce below is belt-and-braces for isolated ids)
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"))
        .groupBy("id")
        .agg(min(col("label")).as("__nbr"))
      // pin + convergence test in ONE job: the checkpoint's task set
      // counts __changed rows while it persists the blocks (the old
      // filter(__changed).isEmpty follow-up job is gone — one fewer
      // scheduler barrier per round to amplify a host stall)
      val (next, nChanged) = Pinned.pinWithChangedCount(
        labels.select(col("id"), col("label"))
          .join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("__nbr"), col("label"))).as("label"),
            (coalesce(col("__nbr"), col("label")) < col("label")).as("__changed")),
        "__changed")
      converged = nChanged == 0L
      Pinned.release(labels) // superseded round — next no longer reads it
      labels = next
      iter += 1
    }
    Pinned.release(edges)
    labels.select(col("id"), col("label").as("cluster"))
    } finally if (small) {
      aqePrev match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None    => spark.conf.unset(aqeKey)
      }
      shufPrev match {
        case Some(v) => spark.conf.set(shufKey, v)
        case None    => spark.conf.unset(shufKey)
      }
    }
  }

  /** Deterministic global shuffle (training-order randomization):
    * total order by md5 of the id — reproducible "randomness" with no
    * RNG. The sort is range-partitioned (scales out); positions come
    * from zipWithIndex, which computes per-partition offsets with one
    * lightweight count pass instead of a single-partition window.
    */
  def deterministicShuffle(docs: DataFrame, idCol: String): DataFrame = {
    val sorted = docs
      .select(col(idCol), md5(col(idCol).cast(StringType)).as("__h"))
      .repartitionByRange(docs.sparkSession.sparkContext.defaultParallelism, col("__h"))
      .sortWithinPartitions("__h")
    val schema = StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField(idCol, LongType, nullable = true)))
    docs.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i, r.getLong(0))
      }, schema)
  }

  /** Sequence packing (contiguous fill): walk each stratum in id
    * order, accumulate token counts, and open a new bin whenever the
    * running total crosses the capacity — bin = floor(preceding
    * cumulative / capacity). Per-stratum windows parallelize across
    * the cluster; no global state.
    */
  def packSequences(docs: DataFrame, stratumCol: String, idCol: String,
      tokensCol: Column, capacity: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(stratumCol), col(idCol), tokensCol.as("__tok"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .select(col(stratumCol), col(idCol),
        ((col("__cum") - col("__tok")) / capacity).cast(LongType).as("bin"),
        col("__tok"))
  }
}
