package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"1997-${1 + (day - 1) / 28}%02d-${1 + (day - 1) % 28}%02d 00:00:00")

  test("overlapPairsSameKey matches the theta-join definition") {
    val rows = (1 to 200).map { i =>
      val start = ((i * 7919) % 140) + 1
      (i.toLong % 7, i.toLong, ts(start), ts(start + (i * 31) % 45))
    }
    val df = rows.toDF("k", "id", "s", "e")
    val got = Intervals.overlapPairsSameKey(df, "k", "id", col("s"), col("e"),
        binSize = 30L * 86400L * 1000000L) // 30-day bands in epoch micros
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val want = (for {
      (k1, i1, s1, e1) <- rows
      (k2, i2, s2, e2) <- rows
      if k1 == k2 && i1 < i2 &&
        !s1.after(e2) && !s2.after(e1)
    } yield (i1, i2)).toSet
    assert(got === want)
  }

  test("pairs spanning several month cells are emitted exactly once") {
    val df = Seq(
      (1L, 10L, ts(5), ts(120)),   // Jan 5 .. May 8
      (1L, 11L, ts(10), ts(110)),  // Jan 10 .. Apr 26 — overlaps 10 in many months
      (1L, 12L, ts(117), ts(119))  // May 5 .. May 7 — disjoint from 11, overlaps 10
    ).toDF("k", "id", "s", "e")
    val got = Intervals.overlapPairsSameKey(df, "k", "id", col("s"), col("e"),
        binSize = 30L * 86400L * 1000000L)
      .select("id1", "id2").as[(Long, Long)].collect().toSeq
    assert(got.size === got.toSet.size)
    assert(got.toSet === Set((10L, 11L), (10L, 12L)))
  }
}
