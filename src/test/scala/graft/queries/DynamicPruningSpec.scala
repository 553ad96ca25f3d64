package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning: joining a HIVE-PARTITIONED fact to a
  * filtered dimension plants a runtime subquery filter on the fact's
  * partition column, so only the matching partition DIRECTORIES are
  * read — on a date-partitioned 100 TB fact this is the difference
  * between scanning one day and scanning the table.
  */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  test("dim filter prunes fact partitions at runtime") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    spark.range(0, 50000)
      .selectExpr("id % 20 AS region_id", "id AS v")
      .write.partitionBy("region_id").parquet(s"$dir/fact")
    spark.range(0, 20)
      .selectExpr("id AS region_id", "concat('r', id) AS name")
      .write.parquet(s"$dir/dim")

    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("name") === "r3")
    val j = fact.join(dim, "region_id")
    j.collect()

    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning in plan:\n$plan")
    // and the scan really narrowed: only region 3's rows flowed
    assert(j.count() === 2500L)
  }
}
