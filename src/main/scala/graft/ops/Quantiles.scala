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

  /** One rank lookup: the value at weighted rank
    * t = (num·W + add) div den of the group (W = total weight) —
    * i.e. the smallest v whose cumulative weight reaches t. The
    * integer (num, den, add) form expresses every percentile-index
    * formula the suite uses without a float in sight: the lower
    * median is (1, 2, 1); ceil(0.05·n) is (5, 100, 99).
    */
  final case class RankSpec(name: String, num: Long, den: Long, add: Long)

  /** Exact values at several weighted ranks per group, ONE histogram
    * pass for all of them. Returns one row per group:
    * (grp, w_total, <spec names in order>). A group whose total
    * weight leaves some target rank at 0 (e.g. W = 0) drops that
    * lookup — and the group entirely if no lookup lands.
    *
    * Per-spec NULL contract: a group survives if ANY spec's lookup
    * lands, and every spec whose own rank never lands (its target is
    * 0 for that group — degenerate tiny/zero-weight groups) reports
    * NULL in that spec's column. Callers that clamp/clip against the
    * returned bounds (q138-style winsorization) must either tolerate
    * a NULL bound propagating into the clipped value or drop groups
    * missing a requested spec — this op deliberately does not choose
    * for them (the whole-group drop happens only when NO spec lands).
    *
    * `bucketWidth` must be a power of two (exact double division).
    */
  def groupRankValues(df: DataFrame, grp: String, v: Column, wt: Column,
      specs: Seq[RankSpec], bucketWidth: Double = 1024.0): DataFrame = {
    // NULL values are excluded up front (the aggregate-function
    // convention: a median over v is the median of the NON-NULL v).
    // Without this, NULLs would land in a NULL bucket that sorts
    // first in the running-sum window, shifting every crossing — and
    // a crossing landing IN the null bucket would silently drop the
    // lookup at the pass-2 equi-join.
    val b = df.select(col(grp), v.cast("double").as("__v"),
        wt.cast("long").as("__w"))
      .filter(col("__v").isNotNull)
      .withColumn("__bk", floor(col("__v") / lit(bucketWidth)).cast("long"))
    // GROUPS × BUCKETS rows — the only aggregate that sees all data,
    // and it combines map-side
    val hist = b.groupBy(grp, "__bk").agg(sum("__w").as("__c"))
    val wb = Window.partitionBy(grp).orderBy("__bk")
    val rs = hist
      .withColumn("__rs", sum("__c").over(wb))
      .withColumn("__wt", sum("__c").over(Window.partitionBy(grp)))
    // every rank spec probes the (histogram-sized) running sum; the
    // crossing bucket and the weight accumulated before it survive
    val specRows = specs.map(sp => struct(lit(sp.name).as("__q"),
      lit(sp.num).as("__nu"), lit(sp.den).as("__de"), lit(sp.add).as("__ad")))
    val targets = rs
      .withColumn("__s", explode(array(specRows: _*)))
      .select(col(grp), col("__bk"), col("__rs"), col("__c"), col("__wt"),
        col("__s.__q").as("__q"),
        expr("(__s.__nu * __wt + __s.__ad) div __s.__de").as("__t"))
      .filter(col("__t") >= 1 &&
        col("__rs") >= col("__t") && col("__rs") - col("__c") < col("__t"))
      .select(col(grp), col("__bk"), col("__q"),
        (col("__t") - col("__rs") + col("__c")).as("__off"), col("__wt"))
    // pass 2: only crossing buckets survive the broadcast join; ties
    // collapse to each bucket's value domain before the final
    // (bucket-sized) running sum
    val bks = targets.select(col(grp), col("__bk")).distinct()
    val cand = b.join(broadcast(bks), Seq(grp, "__bk"))
      .groupBy(grp, "__bk", "__v").agg(sum("__w").as("__c"))
    val wv = Window.partitionBy(grp, "__bk").orderBy("__v")
    val hits = cand.withColumn("__rsb", sum("__c").over(wv))
      .join(broadcast(targets), Seq(grp, "__bk"))
      .filter(col("__rsb") >= col("__off") &&
        col("__rsb") - col("__c") < col("__off"))
      .select(col(grp), col("__q"), col("__v"), col("__wt"))
    val wide = specs.map(sp =>
      max(when(col("__q") === sp.name, col("__v"))).as(sp.name))
    hits.groupBy(grp).agg(max(col("__wt")).as("w_total"), wide: _*)
  }

  /** Exact weighted lower median per group: the smallest value v
    * with 2·(cumulative weight up to v) >= (total group weight) —
    * for unit weights exactly the value at rank (n+1) div 2.
    * Returns one row per group: (grp, median, w_total). Groups whose
    * total weight is zero are dropped (no crossing exists). */
  def groupWeightedMedian(df: DataFrame, grp: String, v: Column, wt: Column,
      bucketWidth: Double = 1024.0): DataFrame =
    groupRankValues(df, grp, v, wt, Seq(RankSpec("median", 1, 2, 1)), bucketWidth)
      .select(col(grp), col("median"), col("w_total"))

  /** Exact lower median per group over unit weights: the value at
    * rank (n+1) div 2. Returns (grp, median, n). */
  def groupMedian(df: DataFrame, grp: String, v: String,
      bucketWidth: Double = 1024.0): DataFrame =
    groupWeightedMedian(df, grp, col(v), lit(1L), bucketWidth)
      .withColumnRenamed("w_total", "n")
      .select(col(grp), col("median"), col("n"))
}
