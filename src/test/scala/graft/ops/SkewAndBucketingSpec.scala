package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAndBucketingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals the direct aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("k").collect()
    val salted = Skew.saltedSumCount(df, Seq("k"), "v",
        saltCol = col("v"), saltBuckets = 8)
      .orderBy("k").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      direct.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("salt is deterministic and spreads keys across buckets") {
    val df = (1L to 100L).toDF("id")
    val buckets = df.select(Skew.salt(col("id"), 8).as("b"))
      .groupBy("b").count().collect()
    assert(buckets.map(_.getLong(0)).forall(b => b >= 0 && b < 8))
    assert(buckets.length >= 6) // 100 ids hit most of 8 buckets
    val twice = df.select(Skew.salt(col("id"), 8).as("b1"), Skew.salt(col("id"), 8).as("b2"))
      .filter(col("b1") =!= col("b2")).count()
    assert(twice === 0)
  }

  test("bucketed tables co-locate the join: no shuffle in the plan") {
    val spark2 = spark
    import spark2.implicits._
    (1 to 500).map(i => (i.toLong, s"name$i")).toDF("id", "name")
      .write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("graft_bucket_left")
    (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("id", "score")
      .write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("graft_bucket_right")

    // tables this small would broadcast (which disables bucketing);
    // force the sort-merge path to observe the co-located join shape
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucket_left")
        .join(spark.table("graft_bucket_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: SortMergeJoin with NO shuffle exchange
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() === 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals the plain join and spreads hot keys over buckets") {
    import org.apache.spark.sql.functions._
    // pathological skew: 3 join keys, one carrying 90% of rows
    val big = spark.range(0, 30000).selectExpr(
      "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('cold', id % 2) END AS k",
      "id AS v")
    val small = Seq(("hot", 1L), ("cold0", 2L), ("cold1", 3L), ("nomatch", 4L))
      .toDF("k", "label")
    val plain = big.join(small, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = Skew.saltedJoin(big, small, "k", saltBy = col("v"), buckets = 8)
      .groupBy("k", "label").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(salted.collect().toSet === plain.collect().toSet)
    // left join keeps unmatched big rows exactly once
    val bigL = Seq(("hot", 1L), ("orphan", 2L)).toDF("k", "v")
    val left = Skew.saltedJoin(bigL, small, "k", saltBy = col("v"),
      buckets = 4, joinType = "left")
    assert(left.collect().map(r => (r.getString(0), Option(r.get(2)))).toSet ===
      Set(("hot", Some(1L)), ("orphan", None)))
    // the hot key really spreads: its rows occupy every salt bucket
    val spread = big.filter(col("k") === "hot")
      .select(Skew.salt(col("v"), 8).as("salt")).distinct().count()
    assert(spread === 8L, "hot key must fan out over all 8 salt buckets")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", col("v"), 4, joinType = "full_outer")
    }
  }
}
