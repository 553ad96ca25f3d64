package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: bucketBy(k) on both sides pre-shuffles
  * the data once at write time; a later join on the bucket key must
  * plan NO Exchange on either side. This is the layout contract that
  * turns the recurring fact-to-fact shuffle into a one-time cost.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def writeBucketed(): Unit = {
    val wh = Files.createTempDirectory("graft-bspec").toString
    spark.sql("DROP TABLE IF EXISTS bspec_left")
    spark.sql("DROP TABLE IF EXISTS bspec_right")
    spark.range(0, 10000).selectExpr("id % 500 AS k", "id AS lv")
      .write.format("parquet").bucketBy(4, "k").sortBy("k")
      .option("path", s"$wh/left").saveAsTable("bspec_left")
    spark.range(0, 2000).selectExpr("id % 500 AS k", "id AS rv")
      .write.format("parquet").bucketBy(4, "k").sortBy("k")
      .option("path", s"$wh/right").saveAsTable("bspec_right")
  }

  test("join on the bucket key plans no shuffle on either side") {
    writeBucketed()
    val j = spark.table("bspec_left").hint("merge")
      .join(spark.table("bspec_right").hint("merge"), "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    // and it's not vacuously green: the same join over unbucketed
    // data DOES shuffle
    val l = spark.range(0, 10000).selectExpr("id % 500 AS k", "id AS lv")
    val r = spark.range(0, 2000).selectExpr("id % 500 AS k", "id AS rv")
    val u = l.hint("merge").join(r.hint("merge"), "k")
    assert(u.queryExecution.executedPlan.toString.contains("Exchange"),
      "premise: the unbucketed form must plan a shuffle")
    // correctness: identical results both ways
    assert(j.groupBy("k").count().orderBy("k").collect().toSeq ===
      u.groupBy("k").count().orderBy("k").collect().toSeq)
  }

  test("aggregation on the bucket key also skips the shuffle") {
    writeBucketed()
    val a = spark.table("bspec_left").groupBy("k").agg(sum("lv").as("s"))
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed groupBy(bucket key) must not shuffle:\n$plan")
    assert(a.count() === 500L)
  }
}
