package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale-safe exact per-group ranking.
  *
  * `Window.partitionBy(group).orderBy(value)` caps parallelism at the
  * number of distinct groups: with 5 groups, every row of each group
  * serializes through one reducer no matter how large the cluster is.
  * This operator computes the same global per-group `row_number` with
  * parallelism proportional to the partition count instead:
  *
  *  1. project the input ONCE to a narrow `(group, key...)` frame and
  *     persist it (MEMORY_AND_DISK) — every sizing / sampling /
  *     counting job below reads that cache instead of re-executing
  *     the input plan. The round-7 design recomputed the input ~4×
  *     (count, boundary sample, bucket counts, final pass), which is
  *     pathological when the input is itself an expensive derived
  *     frame (a tokenizing cross-join ran 4× per ranking);
  *  2. sample boundary keys from the cached frame with a CONTENT-hash
  *     filter (`xxhash64(key) % p == 0`) — deterministic per row
  *     value, so the sample is identical regardless of input
  *     partitioning;
  *  3. broadcast the sorted boundaries as literal structs and assign
  *     each row `__pid` = number of boundaries <= its key — a pure
  *     row-level function, so the final pass recomputes the SAME
  *     placement without pinning the full-width input;
  *  4. per-(__pid, group) counts roll up into per-bucket rank offsets
  *     via a prefix-sum window over the TINY count frame
  *     (numPartitions x numGroups rows — never data-sized). The
  *     offsets are collected and rebuilt as a LOCAL DataFrame, so the
  *     final pass has no lineage into the cached key frame and the
  *     cache is unpersisted before this function even returns;
  *  5. local ranks come from a window partitioned by
  *     (__pid, group) — cardinality scales with the cluster — and the
  *     broadcast offset lifts them to global ranks.
  *
  * Net executions of the input plan: exactly 2 (narrow cache build +
  * final full-width pass) — the minimum for any rank that needs both
  * a global view of the keys and every input column in its output.
  *
  * Ranks of tied values are assigned arbitrarily within the tie run
  * (as with any `row_number` without a total tie-break), but equal
  * keys share a `__pid`, so the tie run is contiguous and the VALUE at
  * any given rank — the thing percentile selection reads — is unique
  * and deterministic.
  */
object Ranks {

  /** Offset rows (numPartitions x numGroups) above this are not
    * collected to the driver; the frame is localCheckpoint'ed instead
    * — still lineage-free, so the key-frame cache is unpersisted
    * either way, but the data never moves to the driver and the join
    * is left un-broadcast. The operator targets low-cardinality
    * groups, so this is a backstop, not a working mode. */
  private val MaxCollectedOffsets = 1 << 20

  /** Count-derived plan routing (the [[graft.ops.Dedup.semanticDup]]
    * discipline applied to ranking): frames at or under this row
    * count take ONE plain per-group window — a single reducer sorting
    * <= 2^20 narrow rows is milliseconds — while larger frames take
    * the de-skew machinery, whose extra fixed jobs (cache build,
    * boundary sample, offset rollup) exist to protect BILLION-row
    * groups, not to tax small ones. The threshold crossing changes
    * the PLAN, never the result: every call site orders with a total
    * tie-break, so both paths assign identical ranks (RanksSpec pins
    * the two outputs row-identical). Overridable per call (tests
    * force the machinery; an unusually wide row can lower it). */
  val SmallFrameMaxRows: Long = 1L << 20

  /** Sampled boundary keys over the cached narrow key frame, as
    * literal structs comparable against the key struct: one cached
    * count sizes the hash filter, one cached scan collects
    * ~parts*128 keys, and every (parts-1)-quantile of the sorted
    * sample becomes a boundary. Boundaries containing nulls are
    * dropped — null keys compare as null and fall through to bucket
    * 0, matching nulls-first range order.
    */
  private def boundaryStructs(
      keyed: DataFrame, keyNames: Seq[String], parts: Int,
      n: Long): Seq[Column] = {
    if (n == 0) return Seq.empty
    val target = parts * 128L
    val p = math.max(1L, n / target)
    val sample = keyed
      .select(keyNames.map(col): _*)
      .where(pmod(xxhash64(keyNames.map(col): _*), lit(p)) === 0)
      .sort(keyNames.map(col): _*)
      .collect()
    if (sample.isEmpty) return Seq.empty
    val schema = keyed.select(keyNames.map(col): _*).schema
    (1 until parts)
      .map(i => sample(((i.toLong * sample.length) / parts).toInt.min(sample.length - 1)))
      .distinct
      .filter(row => !(0 until row.length).exists(row.isNullAt))
      .map { row =>
        struct(schema.fields.zipWithIndex.map { case (f, i) =>
          lit(row.get(i)).cast(f.dataType).as(f.name)
        }.toSeq: _*)
      }
  }

  /** `__pid` as a deterministic function of the row's key: the count
    * of boundaries at or below it. Null comparisons yield null ->
    * counted 0, so null keys land in bucket 0 (nulls-first).
    */
  private def pidExpr(keyStruct: Column, bounds: Seq[Column]): Column =
    bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(keyStruct >= b, 1).otherwise(0)
    }

  /** Materialize the offsets frame with its lineage into the cached
    * key frame CUT, so the caller can unpersist the cache before the
    * returned plan ever runs. `rows` is the exact offset-row count —
    * the caller reads it from the already-computed counts frame (one
    * cheap agg over the cache, never a data-sized collect probe). The
    * working mode (numPartitions x numGroups rows) collects and
    * rebuilds a LOCAL DataFrame; an unexpectedly large frame is
    * localCheckpoint'ed instead — lineage-free without pulling data
    * to the driver. Returns (frame, smallEnoughToBroadcast). */
  private def localized(offsets: DataFrame, rows: Long): (DataFrame, Boolean) =
    if (rows > MaxCollectedOffsets) (graft.ops.Pinned.pin(offsets), false)
    else {
      val local = offsets.collect()
      (offsets.sparkSession.createDataFrame(
        java.util.Arrays.asList(local: _*), offsets.schema), true)
    }

  /** Adds `rn` (1-based global rank of the row within its group,
    * ordered by value then ties) and `n` (group size) to `df`.
    *
    * `df` MUST be deterministic across executions: the bucket counts
    * come from the cached narrow projection, but the final pass
    * recomputes `__pid` over a FRESH execution of the input plan. A
    * nondeterministic input (`rand()`, `sample`, a non-idempotent
    * source) yields offsets and placements from different row sets —
    * silently wrong global ranks, not an error. Pin such inputs with
    * `localCheckpoint()` before calling.
    */
  def groupRanked(
      df: DataFrame,
      group: String,
      value: String,
      ties: Seq[String] = Seq.empty,
      smallFrameMaxRows: Long = SmallFrameMaxRows): DataFrame = {
    val spark = df.sparkSession
    val orderCols = (value +: ties).map(col)
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyCols = col(group) +: orderCols
    val named = keyCols.zipWithIndex.map { case (c, i) => c.as(s"f$i") }
    val keyNames = named.indices.map(i => s"f$i")

    val keyed = df.select(named: _*).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val total = keyed.count()
      if (total <= smallFrameMaxRows) {
        // small-frame route: one plain window, no sampling/offset jobs
        keyed.unpersist(false)
        val grp = Window.partitionBy(col(group))
        return df
          .withColumn("n", count(lit(1)).over(grp).cast("long"))
          .withColumn("rn",
            row_number().over(grp.orderBy(orderCols: _*)).cast("long"))
      }
      val bounds = boundaryStructs(keyed, keyNames, parts, total)
      val pidK = pidExpr(struct(keyNames.map(col): _*), bounds)
      val counts = keyed.withColumn("__pid", pidK)
        .groupBy(col("__pid"), col("f0")).agg(count(lit(1)).as("__c"))
      val prior = Window.partitionBy("f0").orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val nOff = counts.count() // tiny agg over the cache — gates the collect
      val (offsets, small) = localized(counts.select(
        col("__pid").as("__pid2"), col("f0").as("__grp2"),
        coalesce(sum("__c").over(prior), lit(0L)).as("__off"),
        sum("__c").over(Window.partitionBy("f0")).as("n")), nOff)
      keyed.unpersist(false) // both localized paths are lineage-free

      val dfStruct = struct(named: _*)
      val local = Window.partitionBy(col("__pid"), col(group)).orderBy(orderCols: _*)
      // null-SAFE group match: an equi-join would silently drop rows of
      // a NULL group (null never equals null), losing data instead of
      // ranking the null group like any other
      df.withColumn("__pid", pidExpr(dfStruct, bounds))
        .join(if (small) broadcast(offsets) else offsets,
          col("__pid") === col("__pid2") && col(group) <=> col("__grp2"))
        .withColumn("rn", row_number().over(local).cast("long") + col("__off"))
        .drop("__pid", "__pid2", "__grp2", "__off")
    } catch {
      case t: Throwable => keyed.unpersist(false); throw t
    }
  }

  /** Adds `rn`, `n` (as [[groupRanked]]) and `rsum` — the INCLUSIVE
    * running sum of `value` within the group in (`order`, ties) order
    * — without a per-group window: per-bucket local prefix sums are
    * lifted by broadcast per-bucket sum offsets, the same
    * deterministic-bucket trick as the ranks. A running total
    * partitioned by a low-cardinality key (e.g. 20 corpus sources)
    * would otherwise serialize each group through one reducer.
    *
    * Pass an integral or DECIMAL `value` column for cross-engine
    * determinism — double prefix sums are summation-order-dependent
    * by nature (the order here is pinned, but a window oracle may
    * still accumulate in another association).
    *
    * As with [[groupRanked]], `df` must be deterministic across
    * executions (the final pass re-executes the input plan); pin
    * sampled/random inputs with `localCheckpoint()` first.
    */
  def groupRunningSum(
      df: DataFrame,
      group: String,
      order: String,
      value: String,
      ties: Seq[String] = Seq.empty,
      smallFrameMaxRows: Long = SmallFrameMaxRows): DataFrame = {
    val spark = df.sparkSession
    val orderCols = (order +: ties).map(col)
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyCols = col(group) +: orderCols
    val named = keyCols.zipWithIndex.map { case (c, i) => c.as(s"f$i") }
    val keyNames = named.indices.map(i => s"f$i")

    val keyed = df.select(named :+ col(value).as("__v"): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val total = keyed.count()
      if (total <= smallFrameMaxRows) {
        // small-frame route — see [[SmallFrameMaxRows]]. The prefix
        // sum is over the same pinned (order, ties) order, so the
        // running totals are identical to the machinery path's.
        keyed.unpersist(false)
        val grp = Window.partitionBy(col(group))
        val local0 = grp.orderBy(orderCols: _*)
        return df
          .withColumn("n", count(lit(1)).over(grp).cast("long"))
          .withColumn("rn", row_number().over(local0).cast("long"))
          .withColumn("rsum", sum(col(value))
            .over(local0.rowsBetween(Window.unboundedPreceding, 0)))
      }
      val bounds = boundaryStructs(keyed, keyNames, parts, total)
      val pidK = pidExpr(struct(keyNames.map(col): _*), bounds)
      val counts = keyed.withColumn("__pid", pidK)
        .groupBy(col("__pid"), col("f0"))
        .agg(count(lit(1)).as("__c"), sum(col("__v")).as("__s"))
      val prior = Window.partitionBy("f0").orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val nOff = counts.count() // tiny agg over the cache — gates the collect
      val (offsets, small) = localized(counts.select(
        col("__pid").as("__pid2"), col("f0").as("__grp2"),
        coalesce(sum("__c").over(prior), lit(0L)).as("__off"),
        coalesce(sum("__s").over(prior), lit(0L)).as("__soff"),
        sum("__c").over(Window.partitionBy("f0")).as("n")), nOff)
      keyed.unpersist(false) // both localized paths are lineage-free

      val dfStruct = struct(named: _*)
      val local = Window.partitionBy(col("__pid"), col(group)).orderBy(orderCols: _*)
      // null-safe group match — see groupRanked
      df.withColumn("__pid", pidExpr(dfStruct, bounds))
        .join(if (small) broadcast(offsets) else offsets,
          col("__pid") === col("__pid2") && col(group) <=> col("__grp2"))
        .withColumn("rn", row_number().over(local).cast("long") + col("__off"))
        .withColumn("rsum",
          sum(col(value)).over(local.rowsBetween(Window.unboundedPreceding, 0)) + col("__soff"))
        .drop("__pid", "__pid2", "__grp2", "__off", "__soff")
    } catch {
      case t: Throwable => keyed.unpersist(false); throw t
    }
  }
}
