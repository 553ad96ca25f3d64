package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Quantiles]] histogram-refinement selection: exact lower median
  * / weighted median crossings, including ties on the crossing value,
  * values straddling bucket boundaries, and zero-weight groups.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("groupMedian returns the rank (n+1) div 2 value, per group") {
    val df = Seq(
      ("a", 5.0), ("a", 1.0), ("a", 9.0),                  // n=3 -> rank 2 -> 5
      ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0),      // n=4 -> rank 2 -> 4
      ("c", 7.0)).toDF("g", "v")                           // n=1 -> 7
    val got = Quantiles.groupMedian(df, "g", "v").orderBy("g")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 5.0, 3L), ("b", 4.0, 4L), ("c", 7.0, 1L)))
  }

  test("groupMedian is exact across bucket boundaries and under ties") {
    // values straddle the 1024-width bucket edge; duplicates of the
    // crossing value must collapse, not double-count
    val vs = Seq(1000.0, 1020.0, 1020.0, 1030.0, 2050.0, 3070.0, 3070.0)
    val df = vs.map(("g", _)).toDF("g", "v")
    // n=7 -> rank 4 -> sorted(1000,1020,1020,1030,...)(4th) = 1030
    val r = Quantiles.groupMedian(df, "g", "v").head()
    assert(r.getDouble(1) === 1030.0 && r.getLong(2) === 7L)
  }

  test("groupWeightedMedian finds the 2*rsum >= W crossing; zero-weight group drops") {
    val df = Seq(
      ("a", 10.0, 1L), ("a", 20.0, 2L), ("a", 30.0, 3L), // W=6, crossing at 2*(1+2)>=6 -> 20
      ("z", 1.0, 0L), ("z", 2.0, 0L)                     // W=0 -> dropped
    ).toDF("g", "v", "w")
    val got = Quantiles.groupWeightedMedian(df, "g", col("v"), col("w"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 20.0, 6L)))
  }

  test("NULL values are excluded, not bucketed: median over the non-null values") {
    val df = Seq(("g", Some(10.0)), ("g", None), ("g", Some(20.0)),
      ("g", None), ("g", Some(30.0))).toDF("g", "v")
    val r = Quantiles.groupMedian(df, "g", "v").head()
    // n counts the 3 non-null values; rank (3+1) div 2 = 2 -> 20
    assert(r.getDouble(1) === 20.0 && r.getLong(2) === 3L)
  }

  test("groupRankValues serves several rank lookups from one histogram pass") {
    import Quantiles.RankSpec
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    // q1 at rank (n+3) div 4 = 25, q3 at (3n+3) div 4 = 75, median at 50
    val r = Quantiles.groupRankValues(df, "g", col("v"), lit(1L), Seq(
      RankSpec("q1", 1, 4, 3), RankSpec("med", 1, 2, 1), RankSpec("q3", 3, 4, 3)))
      .head()
    assert(r.getAs[Long]("w_total") === 100L)
    assert(r.getAs[Double]("q1") === 25.0)
    assert(r.getAs[Double]("med") === 50.0)
    assert(r.getAs[Double]("q3") === 75.0)
  }

  test("groupWeightedMedian with unit weights equals groupMedian on negatives too") {
    // negative values exercise floor-division bucketing below zero
    val df = Seq(("g", -3000.5), ("g", -10.0), ("g", 4.25), ("g", 2222.0))
      .toDF("g", "v")
    val m = Quantiles.groupMedian(df, "g", "v").head()
    assert(m.getDouble(1) === -10.0 && m.getLong(2) === 4L) // rank (4+1) div 2 = 2
  }
}
