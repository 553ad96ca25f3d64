package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("groupRanked matches a per-group window row_number (total tie-break)") {
    val df = (1 to 500).map(i => (s"g${i % 3}", (i * 7919) % 100, i))
      .toDF("g", "v", "id")
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .select("g", "v", "id", "rn", "n")
    // both routes (small-frame plain window AND the forced machinery)
    // must match the reference relation exactly
    for (ceiling <- Seq(Long.MaxValue, 0L)) {
      val got = Ranks.groupRanked(df, "g", "v", Seq("id"),
          smallFrameMaxRows = ceiling)
        .select("g", "v", "id", "rn", "n")
      assert(got.except(want).count() === 0, s"ceiling=$ceiling")
      assert(want.except(got).count() === 0, s"ceiling=$ceiling")
    }
  }

  test("groupRanked without tie-break still selects the right value at each rank") {
    // heavy ties: value at any rank is unique even if rank assignment
    // within a tie run is arbitrary
    val df = (1 to 300).map(i => ("g", i % 5)).toDF("g", "v")
    val got = Ranks.groupRanked(df, "g", "v", smallFrameMaxRows = 0L)
    assert(got.agg(count(lit(1))).as[Long].head === 300L)
    assert(got.select(countDistinct("rn")).as[Long].head === 300L)
    // ranks 1..60 hold v=0, 61..120 hold v=1, ...
    val bad = got.filter(col("v") =!= floor((col("rn") - 1) / 60)).count()
    assert(bad === 0L)
  }

  test("groupRunningSum matches a per-group running window (total tie-break)") {
    val df = (1 to 400).map(i => (s"s${i % 4}", (i * 31) % 50, i.toLong, i))
      .toDF("g", "o", "v", "id")
    val w = Window.partitionBy("g").orderBy(col("o"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("rsum", sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("g", "o", "v", "id", "rn", "n", "rsum")
    for (ceiling <- Seq(Long.MaxValue, 0L)) {
      val got = Ranks.groupRunningSum(df, "g", "o", "v", Seq("id"),
          smallFrameMaxRows = ceiling)
        .select("g", "o", "v", "id", "rn", "n", "rsum")
      assert(got.except(want).count() === 0, s"ceiling=$ceiling")
      assert(want.except(got).count() === 0, s"ceiling=$ceiling")
    }
  }

  test("groupRanked assignment is invariant to the session partition count (tie-free)") {
    // the boundary sample comes from a CONTENT-hash filter, not
    // runtime range sampling, so the full (g, v, rn) relation must be
    // identical whatever spark.sql.shuffle.partitions is — the
    // property the de-materialized design rests on (the old design
    // needed a localCheckpoint to pin one sampled placement)
    val df = (1 to 800).map(i => (s"g${i % 3}", (i * 7919) % 10000, i))
      .toDF("g", "v", "id") // v effectively tie-free with id tiebreak
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    def run(): Set[(String, Int, Int, Long)] =
      Ranks.groupRanked(df, "g", "v", Seq("id"), smallFrameMaxRows = 0L)
        .select("g", "v", "id", "rn").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    try {
      spark.conf.set(key, "3")
      val a = run()
      spark.conf.set(key, "13")
      val b = run()
      assert(a === b, s"rank assignment changed with partition count: " +
        s"onlyA=${(a -- b).take(3)} onlyB=${(b -- a).take(3)}")
    } finally spark.conf.set(key, before)
  }

  test("groupRunningSum is invariant to the session partition count (tie-free)") {
    // same content-hash-boundary property as groupRanked, now also
    // covering the sum offsets: the full (g, o, rn, rsum) relation
    // must be identical whatever spark.sql.shuffle.partitions is
    val df = (1 to 800).map(i => (s"g${i % 3}", (i * 7919) % 10000, i.toLong, i))
      .toDF("g", "o", "v", "id")
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    def run(): Set[(String, Int, Int, Long, Long)] =
      Ranks.groupRunningSum(df, "g", "o", "v", Seq("id"), smallFrameMaxRows = 0L)
        .select("g", "o", "id", "rn", "rsum").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
          r.getLong(3), r.getLong(4))).toSet
    try {
      spark.conf.set(key, "3")
      val a = run()
      spark.conf.set(key, "13")
      val b = run()
      assert(a === b, s"running sums changed with partition count: " +
        s"onlyA=${(a -- b).take(3)} onlyB=${(b -- a).take(3)}")
    } finally spark.conf.set(key, before)
  }

  test("groupRanked handles null keys and null values (bucket 0, nulls-first rank order)") {
    val df = Seq(
      (Some("g"), Some(5), 1), (Some("g"), None, 2), (Some("g"), Some(1), 3),
      (None: Option[String], Some(2), 4), (Some("g"), None, 5))
      .toDF("g", "v", "id")
    // the null-safe offset join is a MACHINERY property — pin that route
    val all = Ranks.groupRanked(df, "g", "v", Seq("id"), smallFrameMaxRows = 0L)
    // the NULL group must not be dropped (null-safe offset join) and
    // ranks like any other group
    assert(all.count() === 5L)
    val nullG = all.filter(col("g").isNull).select("id", "rn", "n")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(nullG === Seq((4, 1L, 1L)))
    val got = all.filter(col("g") === "g")
      .select("id", "rn").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // within group g: nulls first (ids 2,5 by id order), then v=1, v=5
    assert(got === Map(2 -> 1L, 5 -> 2L, 3 -> 3L, 1 -> 4L))
  }

  test("groupRanked ranks are a contiguous 1..n per group") {
    val df = (1 to 97).map(i => (s"g${i % 2}", 97 - i, i)).toDF("g", "v", "id")
    val per = Ranks.groupRanked(df, "g", "v", Seq("id"), smallFrameMaxRows = 0L)
      .groupBy("g").agg(min("rn").as("lo"), max("rn").as("hi"),
        countDistinct("rn").as("d"), count(lit(1)).as("c"), first("n").as("n"))
      .collect()
    per.foreach { r =>
      assert(r.getAs[Long]("lo") === 1L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("c"))
      assert(r.getAs[Long]("d") === r.getAs[Long]("c"))
      assert(r.getAs[Long]("n") === r.getAs[Long]("c"))
    }
  }

  test("count-derived route: threshold crossing flips the plan, never the rows") {
    val df = (1 to 200).map(i => (s"g${i % 2}", (i * 13) % 97, i))
      .toDF("g", "v", "id")
    val small = Ranks.groupRanked(df, "g", "v", Seq("id"),
      smallFrameMaxRows = 200L) // count == ceiling -> plain window
    val big = Ranks.groupRanked(df, "g", "v", Seq("id"),
      smallFrameMaxRows = 199L) // count > ceiling -> machinery
    assert(small.queryExecution.optimizedPlan.toString !==
      big.queryExecution.optimizedPlan.toString,
      "the route must change the plan")
    assert(small.except(big).count() === 0)
    assert(big.except(small).count() === 0)
  }
}
