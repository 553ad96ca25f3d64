package graft.queries

import graft.SparkSpec

/** Accuracy bounds for the sketch queries (rows-only at the oracle
  * gate — estimates are engine-specific, so the bound check lives
  * here against the exact values computed in the same frame).
  */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct lands within 5% of exact per group") {
    SparkEntryAccess.run(spark, "q66_sketch_distinct", sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"group ${r.get(0)}: $approx vs $exact")
    }
  }

  test("approx median lies within [min, max] per group") {
    SparkEntryAccess.run(spark, "q67_sketch_quantiles", sf).collect().foreach { r =>
      val m = r.getAs[Double]("approx_median")
      assert(m >= r.getAs[Double]("lo") && m <= r.getAs[Double]("hi"))
    }
  }
}

private object SparkEntryAccess {
  def run(spark: org.apache.spark.sql.SparkSession, name: String, sfDir: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)
}
