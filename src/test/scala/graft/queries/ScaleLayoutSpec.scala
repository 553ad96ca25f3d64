package graft.queries

import graft.SparkSpec

/** Physical-layout properties that matter at cluster scale, asserted
  * against the actual executed plans:
  *
  *   - bucketed tables co-locate their join: two tables bucketed and
  *     sorted on the join key produce a sort-merge join with ZERO
  *     exchanges — the layout a 100 TB fact-fact join needs (shuffle
  *     once at write time, join forever free);
  *   - AQE splits a skewed sort-merge-join partition at runtime
  *     (`skew=true` in the final adaptive plan) — the safety net for
  *     hot keys that salting did not anticipate.
  */
class ScaleLayoutSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => (k, spark.conf.getOption(k)) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed + sorted tables sort-merge-join with zero exchanges") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bj_left")
    spark.sql("DROP TABLE IF EXISTS bj_right")
    spark.range(0, 20000).selectExpr("id % 100 AS k", "id AS v").as[(Long, Long)]
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bj_left")
    spark.range(0, 5000).selectExpr("id % 100 AS k", "id AS w").as[(Long, Long)]
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bj_right")

    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table("bj_left").join(spark.table("bj_right"), "k")
      j.collect()
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin"), s"expected SMJ:\n$finalPlan")
      assert(!finalPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$finalPlan")
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one hot key (0) carrying ~24 MB next to a flat tail
    val pad = "x" * 256
    val left = spark.range(0, 100000).selectExpr(
      "CASE WHEN id < 90000 THEN 0 ELSE id % 200 END AS k",
      s"concat('$pad', id) AS payload")
    val right = spark.range(0, 200).selectExpr("id AS k", "id AS w")

    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.shuffle.partitions" -> "8") {
      val j = left.join(right, "k")
      j.collect()
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$finalPlan")
    }
  }
}
