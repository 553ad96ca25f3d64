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
      assert(r.getAs[Long]("exact_orders") > 0L)
      assert(r.getAs[Boolean]("est_within_bound"), s"group ${r.get(0)}")
    }
  }

  test("portable HLL lands within 20% of exact per group (rsd 6.5% at m=256)") {
    SparkEntryAccess.run(spark, "q81_portable_hll", sf).collect().foreach { r =>
      val approx = r.getAs[Double]("approx_orders")
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact <= 0.20, s"group ${r.get(0)}: $approx vs $exact")
    }
  }

  test("HLL shard merge is lossless: merged estimate equals single-pass estimate") {
    val r = SparkEntryAccess.run(spark, "q127_hll_shard_merge", sf).collect().head
    assert(r.getAs[Long]("n_shards") === 8L)
    // bucket-wise max of per-shard maxes IS the global max — bit-equal
    assert(r.getAs[Double]("est_merged") === r.getAs[Double]("est_direct"))
  }

  test("sample quantile is a real data value near the exact median") {
    val med = SparkEntryAccess.run(spark, "q82_sample_quantile", sf).collect()
    assert(med.length == 5) // one row per o_orderpriority
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    med.foreach { r =>
      val prio = r.getAs[String]("o_orderpriority")
      val m = r.getAs[Double]("sample_median")
      val prices = orders.filter(orders("o_orderpriority") === prio)
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      // the 25% hash-sample median must land within the middle half of
      // the full-population distribution
      assert(m >= prices((prices.length * 0.25).toInt) &&
        m <= prices((prices.length * 0.75).toInt), s"$prio: $m")
    }
  }

  test("approx median lies within the exact [p45, p55] window per group") {
    SparkEntryAccess.run(spark, "q67_sketch_quantiles", sf).collect().foreach { r =>
      val m = r.getAs[Double]("exact_median")
      assert(m >= r.getAs[Double]("lo") && m <= r.getAs[Double]("hi"))
      assert(r.getAs[Boolean]("est_within_bound"), s"group ${r.get(0)}")
    }
  }
}

private object SparkEntryAccess {
  def run(spark: org.apache.spark.sql.SparkSession, name: String, sfDir: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)
}
