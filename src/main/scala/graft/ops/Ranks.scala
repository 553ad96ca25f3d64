package graft.ops

import org.apache.spark.sql.DataFrame
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
  *  1. range-repartition by (group, value, ties...) — rows land in
  *     partitions that respect the global sort order;
  *  2. `localCheckpoint` pins the placement (range boundaries are
  *     sampled, so both consumers below must see the SAME shuffle
  *     output, not a re-executed one);
  *  3. per-(partition, group) counts roll up into per-partition rank
  *     offsets via a prefix-sum window over the TINY count frame
  *     (numPartitions × numGroups rows — never data-sized);
  *  4. local ranks come from a window partitioned by
  *     (partition, group) — cardinality scales with the cluster —
  *     and the broadcast offset lifts them to global ranks.
  *
  * Ranks of tied values are assigned arbitrarily within the tie run
  * (as with any `row_number` without a total tie-break), but the tie
  * run is contiguous across partition boundaries, so the VALUE at any
  * given rank — the thing percentile selection reads — is unique and
  * deterministic.
  */
object Ranks {

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

    val ranged = df
      .repartitionByRange(parts, (col(group) +: orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()

    val counts = ranged.groupBy("__pid", group).agg(count(lit(1)).as("__c"))
    val prior = Window.partitionBy(group).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.select(
      col("__pid"), col(group),
      coalesce(sum("__c").over(prior), lit(0L)).as("__off"),
      sum("__c").over(Window.partitionBy(group)).as("n"))

    val local = Window.partitionBy(col("__pid"), col(group)).orderBy(orderCols: _*)
    ranged
      .join(broadcast(offsets), Seq("__pid", group))
      .withColumn("rn", row_number().over(local).cast("long") + col("__off"))
      .drop("__pid", "__off")
  }

  /** Adds `rn`, `n` (as [[groupRanked]]) and `rsum` — the INCLUSIVE
    * running sum of `value` within the group in (`order`, ties) order
    * — without a per-group window: per-partition local prefix sums are
    * lifted by broadcast per-partition sum offsets, the same
    * range-repartition trick as the ranks. A running total
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

    val ranged = df
      .repartitionByRange(parts, (col(group) +: orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()

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
    ranged
      .join(broadcast(offsets), Seq("__pid", group))
      .withColumn("rn", row_number().over(local).cast("long") + col("__off"))
      .withColumn("rsum",
        sum(col(value)).over(local.rowsBetween(Window.unboundedPreceding, 0)) + col("__soff"))
      .drop("__pid", "__off", "__soff")
  }
}
