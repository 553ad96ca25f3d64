package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when a shuffle join's small
  * side carries a selective filter, Catalyst builds a bloom filter
  * over its join keys at runtime and injects a
  * `bloom_filter_might_contain` predicate into the BIG side's scan —
  * rows that cannot join are dropped before the shuffle. On a 100 TB
  * fact-to-dim join this cuts the dominant cost (shuffling the fact)
  * by the dim filter's selectivity, complementing DPP (which needs a
  * partitioned layout; the bloom filter works on any layout).
  */
class RuntimeBloomFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact scan") {
    val dir = Files.createTempDirectory("graft-bloom").toString
    spark.range(0, 200000)
      .selectExpr("id % 1000 AS k", "id AS v")
      .write.parquet(s"$dir/fact")
    spark.range(0, 1000)
      .selectExpr("id AS k", "id % 50 AS flag")
      .write.parquet(s"$dir/dim")

    val conf = spark.conf
    val prevThresh = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // the application-side size gate defaults to 10GB — far above
      // any local fixture; drop it so the test-scale fact qualifies.
      // Broadcast off: the runtime filter targets SHUFFLE joins.
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("flag") === 3)
      val j = fact.join(dim, "k")
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter in:\n$opt")
      // 20 dim keys survive the filter × 200 fact rows per key
      assert(j.count() === 4000L)
    } finally {
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        prevThresh)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }
}
