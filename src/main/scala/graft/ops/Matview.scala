package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a row-level change
  * feed — the consumer side of the TxLog change data feed
  * ([[graft.sink.TxLogTable.changes]]).
  *
  * A keyed additive aggregate (COUNT + SUMs) is self-maintainable
  * from insert/delete deltas alone: each insert contributes +1/+value,
  * each delete -1/-value, and an update (delete(old) + insert(new) in
  * the feed) nets out to the value difference. Folding the delta into
  * the previous state therefore equals recomputing the aggregate over
  * the new snapshot — without touching any unchanged row.
  *
  * Scale posture: the delta is pre-aggregated per key BEFORE the join
  * (map-side combine collapses the feed to at most one row per
  * touched key), then a full-outer equi-join merges it with the
  * state. Work is O(|delta| + |touched keys|), not O(|table|) — at
  * 100 TB this is the difference between maintaining a view in
  * seconds per commit and re-scanning the lake. Derived aggregates
  * that are algebraic over (count, sum) — AVG = sum/n — come out of
  * the maintained columns for free; non-additive aggregates (MIN/MAX
  * under deletes, exact DISTINCT) are out of contract here and need
  * either a recompute or an auxiliary structure.
  */
object Matview {

  /** Initial state of the view: COUNT + the requested SUMs per key.
    *
    * `sums` maps output column name → source expression (any SQL
    * expression over the snapshot's columns). The state carries
    * `n` (row count per key) plus one column per entry.
    */
  def initialize(snapshot: DataFrame, keys: Seq[String],
      sums: Map[String, String]): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      sums.toSeq.sortBy(_._1).map { case (out, e) => sum(expr(e)).as(out) }
    snapshot.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a change feed (rows tagged `_change_type` insert|delete)
    * into `state`, returning the maintained state. Keys that net to
    * zero rows drop out, newly-touched keys appear — the result is
    * exactly `initialize(newSnapshot, ...)` for the snapshot the feed
    * leads to (MatviewSpec and q235 prove this identity).
    */
  def applyDelta(state: DataFrame, changes: DataFrame, keys: Seq[String],
      sums: Map[String, String]): DataFrame = {
    val sign: Column =
      when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val sumCols = sums.toSeq.sortBy(_._1)
    val deltaAggs = sum(sign).as("n") +:
      sumCols.map { case (out, e) => sum(sign * expr(e)).as(out) }
    // pre-aggregate the feed per key: one row per touched key reaches
    // the join regardless of how many change rows the feed carries
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val s = state.select(
      keys.map(col) ++ (("n" +: sumCols.map(_._1)).map(c => col(c).as(s"__s_$c"))): _*)
    val d = delta.select(
      keys.map(col) ++ (("n" +: sumCols.map(_._1)).map(c => col(c).as(s"__d_$c"))): _*)
    val merged = s.join(d, keys, "full_outer")
    val outCols = keys.map(col) ++ ("n" +: sumCols.map(_._1)).map { c =>
      (coalesce(col(s"__s_$c"), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L))).as(c)
    }
    merged.select(outCols: _*).filter(col("n") > 0)
  }
}
