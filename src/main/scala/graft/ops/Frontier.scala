package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe Pareto frontier (2-D skyline: maximize one metric,
  * minimize the other).
  *
  * The naive formulation is a dominance anti-join — every row against
  * every row, O(n²) pairs and a broadcast nested loop. This operator
  * computes the identical frontier with one aggregation and a
  * prefix-min in O(n log n) work and full parallelism:
  *
  *  1. collapse to the "staircase": per distinct `maxCol` value, the
  *     best (minimum) `minCol` — a groupBy, shuffle keyed by maxCol;
  *  2. range-repartition the staircase by `maxCol` DESC and pin the
  *     placement with `localCheckpoint` (range boundaries are sampled;
  *     both consumers must see the same shuffle output);
  *  3. per-partition minima roll up into prefix offsets over a
  *     #partitions-sized frame (the only single-reducer step — never
  *     data-sized);
  *  4. the running min of `minCol` over STRICTLY-greater `maxCol`
  *     values = least(local running min, broadcast partition offset).
  *
  * A row is dominated iff some strictly-greater-`maxCol` row has
  * `minCol` ≤ its own (the prefix min), or a same-`maxCol` row has a
  * strictly smaller `minCol` (the staircase value). Duplicate points
  * do not dominate each other — both survive, matching the SQL
  * `NOT EXISTS (… AND (strict in at least one coordinate))` oracle.
  */
object Frontier {

  def skyline(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    // the input feeds TWO consumers — the staircase aggregate and the
    // final dominance join back onto every row — so an unpinned input
    // lineage executes twice (for q144 that was the full
    // lineitem ⋈ orders aggregate, the only data-sized work in the
    // query, paid twice at any scale). Checkpoint it once; like
    // `pref` below the backing blocks are caller-owned (the returned
    // frame reads them).
    val in = graft.ops.Pinned.pin(df)

    val stair = in.groupBy(maxCol).agg(min(minCol).as("__mn"))

    val ranged = stair
      .repartitionByRange(parts, col(maxCol).desc)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.ops.Pinned.pin)

    // tiny frame: one row per partition
    val prior = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("__pid").agg(min("__mn").as("__pmn"))
      .select(col("__pid"), min("__pmn").over(prior).as("__poff"))

    // local running min over strictly-preceding rows of the partition;
    // stair rows have distinct maxCol, so "preceding" = greater maxCol
    val localPrior = Window.partitionBy("__pid").orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = ranged
      .join(broadcast(offsets), Seq("__pid"))
      // least() skips nulls (first row of first partition has neither)
      .withColumn("__pref", least(min("__mn").over(localPrior), col("__poff")))
      .select(col(maxCol), col("__mn"), col("__pref"))
      // eager + stair-sized (one row per distinct maxCol): checkpoint
      // it so `ranged` — same magnitude but now superseded — releases
      // before the full-data join below; the pref checkpoint backing
      // the returned frame is caller-owned ([[Pinned]])
      .transform(graft.ops.Pinned.pin)
    Pinned.release(ranged)

    in.join(pref, Seq(maxCol))
      .filter(
        !(col("__pref").isNotNull && col("__pref") <= col(minCol)) &&
          !(col("__mn") < col(minCol)))
      .drop("__mn", "__pref")
  }
}
