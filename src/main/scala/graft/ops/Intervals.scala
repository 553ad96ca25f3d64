package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked interval overlap join.
  *
  * A theta join on `a.start <= b.end AND b.start <= a.end` has no
  * equi-key, so Spark would plan a nested-loop join — quadratic in
  * rows per key and a non-starter at scale. Banding restores an
  * equi-join: every interval is exploded onto the calendar-month
  * cells it covers, candidates meet on (key, cell), the exact overlap
  * predicate runs as a residual filter, and `distinct` collapses
  * pairs that share several cells.
  *
  * Shuffle volume is rows × cells-per-interval (bounded: a 30-day
  * window touches ≤ 2 month cells); pair expansion is per (key, cell)
  * bucket, never global. Pick the grid granularity of the same order
  * as typical interval length — too fine multiplies the explode, too
  * coarse fattens the buckets.
  */
object Intervals {

  /** Distinct (id1 < id2) pairs of same-`key` rows whose
    * [start, end] intervals overlap (inclusive bounds).
    */
  def overlapPairsSameKey(
      df: DataFrame,
      key: String,
      id: String,
      start: Column,
      end: Column): DataFrame = {
    val cells = df.select(
      col(key), col(id), start.as("__s"), end.as("__e"),
      explode(sequence(
        date_trunc("month", start),
        date_trunc("month", end),
        expr("INTERVAL 1 MONTH"))).as("__cell"))
    cells.as("a")
      .join(cells.as("b"),
        col(s"a.$key") === col(s"b.$key") &&
          col("a.__cell") === col("b.__cell") &&
          col(s"a.$id") < col(s"b.$id") &&
          col("a.__s") <= col("b.__e") && col("b.__s") <= col("a.__e"))
      .select(col(s"a.$key").as(key),
        col(s"a.$id").as("id1"), col(s"b.$id").as("id2"))
      .distinct()
  }
}
