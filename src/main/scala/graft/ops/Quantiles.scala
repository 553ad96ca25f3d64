package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics by histogram refinement.
  *
  * The selection problem (find the value where a group's running
  * weight crosses half the total) does not need a rank over the
  * data: pass 1 histograms the weights into fixed-width value
  * buckets — a map-side-combinable aggregate whose output is
  * GROUPS × BUCKETS rows no matter the corpus — and a tiny running
  * sum over that histogram locates the one bucket holding the
  * crossing plus the weight already accumulated before it; pass 2
  * re-scans, keeps only that bucket's rows (a broadcast semi-join —
  * ~1/buckets of each group), and finds the exact crossing value by
  * a value-domain running sum. Two full scans, zero data-sized
  * shuffles, zero pinned frames — where a rank approach shuffles the
  * corpus once per pass and single-tasks each low-cardinality
  * group's window. At 100 TB the histogram is still thousands of
  * rows; if a value distribution concentrates a group's mass into
  * one bucket the candidate set degrades toward n — add a refinement
  * level (re-histogram the candidate bucket) before reaching for
  * ranks.
  *
  * Determinism: bucket ids floor an exact double division by a
  * power of two (exact for integer-valued v below 2^53 and for any
  * double — same bits in, same bucket out), the running sums are
  * integer, and ties inside a bucket collapse by value —
  * bit-identical on any partitioning.
  */
object Quantiles {

  /** Exact weighted lower median per group: the smallest value v
    * with 2·(cumulative weight up to v) >= (total group weight) —
    * for unit weights exactly the value at rank (n+1) div 2.
    * Returns one row per group: (grp, median, w_total). Groups whose
    * total weight is zero are dropped (no crossing exists).
    * `bucketWidth` must be a power of two (exact double division).
    */
  def groupWeightedMedian(df: DataFrame, grp: String, v: Column, wt: Column,
      bucketWidth: Double = 1024.0): DataFrame = {
    val b = df.select(col(grp), v.cast("double").as("__v"),
        wt.cast("long").as("__w"))
      .withColumn("__bk", floor(col("__v") / lit(bucketWidth)).cast("long"))
    // GROUPS × BUCKETS rows — the only aggregate that sees all data,
    // and it combines map-side
    val hist = b.groupBy(grp, "__bk").agg(sum("__w").as("__c"))
    val wb = Window.partitionBy(grp).orderBy("__bk")
    val targets = hist
      .withColumn("__rs", sum("__c").over(wb))
      .withColumn("__wt", sum("__c").over(Window.partitionBy(grp)))
      .filter(col("__rs") * 2 >= col("__wt") &&
        (col("__rs") - col("__c")) * 2 < col("__wt"))
      .select(col(grp), col("__bk"),
        (col("__rs") - col("__c")).as("__prior"), col("__wt"))
    // pass 2: only the crossing bucket's rows survive the broadcast
    // join; ties collapse to the bucket's value domain before the
    // final (bucket-sized) running sum
    val cand = b.join(broadcast(targets), Seq(grp, "__bk"))
      .groupBy(grp, "__prior", "__wt", "__v").agg(sum("__w").as("__c"))
    val wv = Window.partitionBy(grp).orderBy("__v")
    cand.withColumn("__rs", col("__prior") + sum("__c").over(wv))
      .filter(col("__rs") * 2 >= col("__wt") &&
        (col("__rs") - col("__c")) * 2 < col("__wt"))
      .select(col(grp), col("__v").as("median"), col("__wt").as("w_total"))
  }

  /** Exact lower median per group over unit weights: the value at
    * rank (n+1) div 2. Returns (grp, median, n). */
  def groupMedian(df: DataFrame, grp: String, v: String,
      bucketWidth: Double = 1024.0): DataFrame =
    groupWeightedMedian(df, grp, col(v), lit(1L), bucketWidth)
      .withColumnRenamed("w_total", "n")
}
