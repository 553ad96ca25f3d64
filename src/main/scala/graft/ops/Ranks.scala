package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact per-group ranking.
  *
  * `Window.partitionBy(group).orderBy(value)` caps parallelism at the
  * number of distinct groups: with 5 groups, every row of each group
  * serializes through one reducer no matter how large the cluster is.
  * This operator computes the same global per-group `row_number` with
  * parallelism proportional to the partition count instead:
  *
  *  1. sample boundary keys with a CONTENT-hash filter
  *     (`xxhash64(key) % p == 0`) — deterministic per row value, so
  *     the sample is identical regardless of input partitioning, and
  *     the scan is pruned to the key columns;
  *  2. broadcast the sorted boundaries as literal structs and assign
  *     each row `__pid` = number of boundaries <= its key — a pure
  *     row-level function, so every consumer recomputes the SAME
  *     placement and nothing needs to be pinned or materialized
  *     (the previous design `localCheckpoint`ed the whole ranged
  *     relation because `repartitionByRange` re-samples per
  *     execution; at 100 TB that materializes the table to executor
  *     storage);
  *  3. per-(__pid, group) counts roll up into per-bucket rank offsets
  *     via a prefix-sum window over the TINY count frame
  *     (numPartitions x numGroups rows — never data-sized);
  *  4. local ranks come from a window partitioned by
  *     (__pid, group) — cardinality scales with the cluster — and the
  *     broadcast offset lifts them to global ranks.
  *
  * Ranks of tied values are assigned arbitrarily within the tie run
  * (as with any `row_number` without a total tie-break), but equal
  * keys share a `__pid`, so the tie run is contiguous and the VALUE at
  * any given rank — the thing percentile selection reads — is unique
  * and deterministic.
  */
object Ranks {

  /** Sampled boundary keys for (group, orderCols), as literal structs
    * comparable against `keyStruct`: one count job (parquet
    * count-pushdown cheap) sizes the hash filter, one pruned scan
    * collects ~parts*128 keys, and every (parts-1)-quantile of the
    * sorted sample becomes a boundary. Boundaries containing nulls are
    * dropped — null keys compare as null and fall through to bucket 0,
    * matching nulls-first range order.
    */
  private def boundaryStructs(
      df: DataFrame, keyCols: Seq[Column], parts: Int): Seq[Column] = {
    val keyed = df.select(keyCols.zipWithIndex.map {
      case (c, i) => c.as(s"f$i")
    }: _*)
    val n = keyed.count()
    if (n == 0) return Seq.empty
    val target = parts * 128L
    val p = math.max(1L, n / target)
    val names = keyed.columns.toSeq
    val sample = keyed
      .where(pmod(xxhash64(names.map(col): _*), lit(p)) === 0)
      .sort(names.map(col): _*)
      .collect()
    if (sample.isEmpty) return Seq.empty
    val schema = keyed.schema
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
  private def withPid(
      df: DataFrame, keyCols: Seq[Column], parts: Int): DataFrame = {
    val keyStruct = struct(keyCols.zipWithIndex.map {
      case (c, i) => c.as(s"f$i")
    }: _*)
    val bounds = boundaryStructs(df, keyCols, parts)
    val pid = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(keyStruct >= b, 1).otherwise(0)
    }
    df.withColumn("__pid", pid)
  }

  /** Adds `rn` (1-based global rank of the row within its group,
    * ordered by value then ties) and `n` (group size) to `df`.
    */
  def groupRanked(
      df: DataFrame,
      group: String,
      value: String,
      ties: Seq[String] = Seq.empty): DataFrame = {
    val spark = df.sparkSession
    val orderCols = (value +: ties).map(col)
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val ranged = withPid(df, col(group) +: orderCols, parts)

    val counts = ranged.groupBy("__pid", group).agg(count(lit(1)).as("__c"))
    val prior = Window.partitionBy(group).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.select(
      col("__pid"), col(group),
      coalesce(sum("__c").over(prior), lit(0L)).as("__off"),
      sum("__c").over(Window.partitionBy(group)).as("n"))

    val local = Window.partitionBy(col("__pid"), col(group)).orderBy(orderCols: _*)
    // null-SAFE group match: an equi-join would silently drop rows of
    // a NULL group (null never equals null), losing data instead of
    // ranking the null group like any other
    ranged
      .join(broadcast(offsets.withColumnRenamed("__pid", "__pid2")
          .withColumnRenamed(group, "__grp2")),
        col("__pid") === col("__pid2") && col(group) <=> col("__grp2"))
      .withColumn("rn", row_number().over(local).cast("long") + col("__off"))
      .drop("__pid", "__pid2", "__grp2", "__off")
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
    */
  def groupRunningSum(
      df: DataFrame,
      group: String,
      order: String,
      value: String,
      ties: Seq[String] = Seq.empty): DataFrame = {
    val spark = df.sparkSession
    val orderCols = (order +: ties).map(col)
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val ranged = withPid(df, col(group) +: orderCols, parts)

    val counts = ranged.groupBy("__pid", group)
      .agg(count(lit(1)).as("__c"), sum(col(value)).as("__s"))
    val prior = Window.partitionBy(group).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.select(
      col("__pid"), col(group),
      coalesce(sum("__c").over(prior), lit(0L)).as("__off"),
      coalesce(sum("__s").over(prior), lit(0L)).as("__soff"),
      sum("__c").over(Window.partitionBy(group)).as("n"))

    val local = Window.partitionBy(col("__pid"), col(group)).orderBy(orderCols: _*)
    // null-safe group match — see groupRanked
    ranged
      .join(broadcast(offsets.withColumnRenamed("__pid", "__pid2")
          .withColumnRenamed(group, "__grp2")),
        col("__pid") === col("__pid2") && col(group) <=> col("__grp2"))
      .withColumn("rn", row_number().over(local).cast("long") + col("__off"))
      .withColumn("rsum",
        sum(col(value)).over(local.rowsBetween(Window.unboundedPreceding, 0)) + col("__soff"))
      .drop("__pid", "__pid2", "__grp2", "__off", "__soff")
  }
}
