package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side Morton decode: inverse of Layout.zValue. */
  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var a = 0L; var b = 0L
    (0 until bits).foreach { i =>
      a |= ((z >> (2 * i + 1)) & 1L) << i
      b |= ((z >> (2 * i)) & 1L) << i
    }
    (a, b)
  }

  test("zValue round-trips for the full 6-bit × 6-bit grid") {
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val rows = grid.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 6).as("z"))
      .collect()
    assert(rows.length === 4096)
    rows.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z >= 0L && z < 4096L)
      assert(deinterleave(z, 6) === ((a, b)), s"z=$z does not decode to ($a,$b)")
    }
    // bijective: 4096 distinct z values
    assert(rows.map(_.getLong(2)).distinct.length === 4096)
  }

  test("curve locality: one z-range segment bounds both dimensions") {
    // any aligned 64-value z segment (one q98 zbucket) covers a
    // rectangle of at most 8×8 in (a, b) space — the pruning property
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val byBucket = grid
      .map { case (a, b) =>
        val z = (0 until 6).map(i =>
          (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))).reduce(_ | _)
        (z >> 6, a, b)
      }
      .groupBy(_._1)
    byBucket.foreach { case (bucket, cells) =>
      val as = cells.map(_._2); val bs = cells.map(_._3)
      assert(as.max - as.min <= 7, s"zbucket $bucket spans a-range ${as.min}..${as.max}")
      assert(bs.max - bs.min <= 7, s"zbucket $bucket spans b-range ${bs.min}..${bs.max}")
    }
  }
}
