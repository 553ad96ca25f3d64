package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection: a selective filter on the build
  * side of a shuffle join makes Catalyst build a bloom filter over
  * the join keys and push `bloom_filter_might_contain` into the probe
  * side's scan — at 100 TB this prunes most of the fact table before
  * the shuffle. Asserted on the optimized plan of real parquet
  * relations (the rule needs file-source statistics).
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => (k, spark.conf.getOption(k)) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter into the fact scan") {
    val dir = Files.createTempDirectory("graft-rf").toString
    spark.range(0, 200000).selectExpr("id % 1000 AS k", "id AS v")
      .write.parquet(s"$dir/fact")
    spark.range(0, 1000).selectExpr("id AS k", "concat('n', id) AS name")
      .write.parquet(s"$dir/dim")

    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("name") === "n7")
      val j = fact.join(dim, "k")
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"expected runtime bloom filter in optimized plan:\n$optimized")
      // and the result is correct: only k = 7 survives
      val rows = j.count()
      assert(rows === 200L)
    }
  }
}
