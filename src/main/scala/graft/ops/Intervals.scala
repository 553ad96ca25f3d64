package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval overlap join, banded.
  *
  * A theta join on `a.start <= b.end AND b.start <= a.end` has no
  * usable equi-key (even with a same-key conjunct, the per-key work is
  * an all-pairs product — quadratic in the hottest key), so Spark
  * would fall back to per-key nested loops. The declarative naive join
  * built here is handed to the [[graft.plans.BandedRangeJoin]]
  * interval-overlap rewrite: every interval explodes onto the
  * fixed-width band cells it covers, candidates meet on (key, cell)
  * as an ordinary shuffle equi-join, the exact overlap predicate runs
  * as a residual, and a first-shared-band residual equality emits each
  * qualifying pair exactly once — no `distinct()` shuffle.
  *
  * Shuffle volume is rows × cells-per-interval; pick `binSize` of the
  * same order as typical interval length (units: days for date
  * intervals, epoch micros for timestamps, raw value for integers) —
  * too fine multiplies the explode, too coarse fattens the buckets.
  */
object Intervals {

  /** (id1 < id2) pairs of same-`key` rows whose [start, end]
    * intervals overlap (inclusive bounds); one output row per
    * qualifying pair (ids are assumed unique per row, as a join key
    * should be).
    */
  def overlapPairsSameKey(
      df: DataFrame,
      key: String,
      id: String,
      start: Column,
      end: Column,
      binSize: Long): DataFrame = {
    val a = df.select(col(key), col(id).as("id1"),
      start.as("__s1"), end.as("__e1"))
    val b = df.select(col(key).as("__k2"), col(id).as("id2"),
      start.as("__s2"), end.as("__e2"))
    val naive = a.join(b,
      col(key) === col("__k2") && col("id1") < col("id2") &&
        col("__s1") <= col("__e2") && col("__s2") <= col("__e1"))
    RangeJoin.banded(naive, binSize)
      .select(col(key), col("id1"), col("id2"))
  }
}
