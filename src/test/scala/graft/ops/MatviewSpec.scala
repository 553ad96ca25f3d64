package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.TxLogTable
import org.apache.spark.sql.DataFrame

/** Incremental view maintenance: folding the TxLog change feed into a
  * keyed additive aggregate must equal recomputing the aggregate over
  * the new snapshot — including keys that vanish (all rows deleted)
  * and keys that appear (first insert).
  */
class MatviewSpec extends SparkSpec {
  import spark.implicits._

  private def viewRows(df: DataFrame): Set[(String, Long, Long)] =
    df.select("g", "n", "s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("maintained state equals recompute across append, delete, update, merge") {
    val t = Files.createTempDirectory("graft-mv").resolve("t").toString
    val sums = Map("s" -> "v")
    val keys = Seq("g")

    TxLogTable.append(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L))
      .toDF("g", "k", "v").coalesce(1), t) // v1
    val state0 = Matview.initialize(
      TxLogTable.read(spark, t, Some(1L)).select("g", "v"), keys, sums)
    assert(viewRows(state0) === Set(("a", 2L, 30L), ("b", 1L, 30L)))

    TxLogTable.append(Seq(("c", 4L, 5L)).toDF("g", "k", "v").coalesce(1), t) // v2: new key
    TxLogTable.delete(spark, t, "g = 'b'")                                   // v3: key drops
    TxLogTable.update(spark, t, "k = 2", Map("v" -> "v + 100"))              // v4: net change
    val last = TxLogTable.versions(spark, t).max
    val feed = TxLogTable.changes(spark, t, 1L, last).select("g", "v", "_change_type")

    val maintained = Matview.applyDelta(state0, feed, keys, sums)
    assert(viewRows(maintained) === Set(("a", 2L, 130L), ("c", 1L, 5L)),
      "b must drop out (n=0), c must appear, a's update must net +100")

    val recomputed = Matview.initialize(
      TxLogTable.read(spark, t).select("g", "v"), keys, sums)
    assert(viewRows(maintained) === viewRows(recomputed),
      "incremental maintenance must equal full recompute")
  }

  test("folding deltas version-by-version equals folding the whole range at once") {
    val t = Files.createTempDirectory("graft-mv2").resolve("t").toString
    TxLogTable.append(Seq(("x", 1L, 7L), ("y", 2L, 9L))
      .toDF("g", "k", "v").coalesce(1), t)
    val sums = Map("s" -> "v")
    var state = Matview.initialize(
      TxLogTable.read(spark, t, Some(1L)).select("g", "v"), Seq("g"), sums)
    TxLogTable.append(Seq(("x", 3L, 1L)).toDF("g", "k", "v").coalesce(1), t)
    TxLogTable.delete(spark, t, "g = 'y'")
    val vs = TxLogTable.versions(spark, t).sorted
    for (Seq(lo, hi) <- vs.sliding(2))
      state = Matview.applyDelta(state,
        TxLogTable.changes(spark, t, lo, hi).select("g", "v", "_change_type"),
        Seq("g"), sums)
    val oneShot = Matview.applyDelta(
      Matview.initialize(TxLogTable.read(spark, t, Some(1L)).select("g", "v"),
        Seq("g"), sums),
      TxLogTable.changes(spark, t, 1L, vs.max).select("g", "v", "_change_type"),
      Seq("g"), sums)
    assert(viewRows(state) === viewRows(oneShot))
    assert(viewRows(state) === Set(("x", 2L, 8L)))
  }
}
