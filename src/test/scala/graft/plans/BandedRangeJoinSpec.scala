package graft.plans

import graft.SparkSpec
import graft.ops.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The banded range-join rewrite: result equivalence against the
  * naive nested-loop plan, the physical shape (equi-join on the band,
  * no nested loop), the conf-gated automatic path, and the guards.
  */
class BandedRangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random rows: negatives, duplicates, nulls,
  // and inverted/empty intervals all represented
  private def points: DataFrame = {
    val rnd = new scala.util.Random(7)
    (1 to 400).map { i =>
      val v = rnd.nextInt(2000) - 1000
      (i.toLong, if (i % 19 == 0) None else Some(v.toLong))
    }.toDF("p_id", "p")
  }

  private def intervals: DataFrame = {
    val rnd = new scala.util.Random(13)
    (1 to 120).map { i =>
      val lo = rnd.nextInt(2200) - 1100
      val w = rnd.nextInt(200) - 20 // ~10% inverted (lo > hi)
      (i.toLong,
        if (i % 17 == 0) None else Some(lo.toLong),
        if (i % 23 == 0) None else Some((lo + w).toLong))
    }.toDF("i_id", "lo", "hi")
  }

  private def naive: DataFrame =
    points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("p_id", "i_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("banded equals naive across band widths (incl. negatives, nulls, empty intervals)") {
    val expected = pairs(naive)
    assert(expected.nonEmpty)
    for (bin <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      assert(pairs(RangeJoin.banded(naive, bin)) === expected,
        s"bin=$bin diverged")
    }
  }

  test("strict bounds stay strict through the residual") {
    val strict = points.join(intervals, $"p" > $"lo" && $"p" < $"hi")
    assert(pairs(RangeJoin.banded(strict, 50L)) === pairs(strict))
  }

  test("bounds may be expressions: point within [t, t + 100] of the other side") {
    val anchors = Seq((1L, 0L), (2L, 500L), (3L, -300L)).toDF("a_id", "t")
    val p = points.na.drop()
    val naive2 = p.join(anchors, $"p" >= $"t" && $"p" <= $"t" + lit(100L))
    val got = RangeJoin.banded(naive2, 64L)
      .select("p_id", "a_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = naive2
      .select("p_id", "a_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exp)
  }

  test("timestamp domain bands on epoch micros") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:03:30"),
      (3L, "2024-01-01 11:00:00"), (4L, "2024-01-02 09:59:59"))
      .toDF("e_id", "s").select($"e_id", $"s".cast("timestamp").as("ts"))
    val win = Seq(
      (10L, "2024-01-01 10:00:00", "2024-01-01 10:05:00"),
      (11L, "2024-01-02 09:00:00", "2024-01-02 10:00:00"))
      .toDF("w_id", "a", "b")
      .select($"w_id", $"a".cast("timestamp").as("w_lo"), $"b".cast("timestamp").as("w_hi"))
    val naiveT = ev.join(win, $"ts" >= $"w_lo" && $"ts" <= $"w_hi")
    val got = RangeJoin.banded(naiveT, 300L * 1000 * 1000)
      .select("e_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 10L), (4L, 11L)))
  }

  test("physical plan: equi-join on the band, no nested loop") {
    withAutoBroadcastOff {
      val nl = naive.queryExecution.executedPlan.toString
      assert(nl.contains("NestedLoopJoin") || nl.contains("CartesianProduct"),
        s"premise broken — naive plan should be a nested loop:\n$nl")
      val banded = RangeJoin.banded(naive, 64L).queryExecution.executedPlan.toString
      assert(!banded.contains("NestedLoopJoin") && !banded.contains("CartesianProduct"),
        s"banded plan still nested-loop:\n$banded")
      assert(banded.contains("SortMergeJoin") || banded.contains("ShuffledHashJoin"),
        s"banded plan lacks an equi-join:\n$banded")
    }
  }

  test("conf-gated optimizer rule rewrites the declarative join automatically") {
    if (!spark.experimental.extraOptimizations.contains(BandedRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandedRangeJoin
    withAutoBroadcastOff {
      try {
        spark.conf.set(BandedRangeJoin.BinSizeConf, "64")
        val plan = naive.queryExecution.executedPlan.toString
        assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"rule did not fire:\n$plan")
        assert(pairs(naive) === {
          spark.conf.unset(BandedRangeJoin.BinSizeConf)
          pairs(naive)
        })
      } finally spark.conf.unset(BandedRangeJoin.BinSizeConf)
    }
  }

  test("guard: joins with a cross-side equi-key are left untouched") {
    val l = Seq((1L, 5L)).toDF("k", "v")
    val r = Seq((1L, 0L, 10L)).toDF("k2", "lo2", "hi2")
    val keyed = l.join(r, $"k" === $"k2" && $"v" >= $"lo2" && $"v" <= $"hi2")
    val ex = intercept[IllegalArgumentException](RangeJoin.banded(keyed, 10L))
    assert(ex.getMessage.contains("no rewritable"))
  }

  test("guard: outer joins and single-bound conditions are not rewritten") {
    val single = points.join(intervals, $"p" >= $"lo")
    intercept[IllegalArgumentException](RangeJoin.banded(single, 10L))
    val outer = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi", "left")
    intercept[IllegalArgumentException](RangeJoin.banded(outer, 10L))
  }

  private def withAutoBroadcastOff[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
