package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("groupRanked matches a per-group window row_number (total tie-break)") {
    val df = (1 to 500).map(i => (s"g${i % 3}", (i * 7919) % 100, i))
      .toDF("g", "v", "id")
    val got = Ranks.groupRanked(df, "g", "v", Seq("id"))
      .select("g", "v", "id", "rn", "n")
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .select("g", "v", "id", "rn", "n")
    assert(got.except(want).count() === 0)
    assert(want.except(got).count() === 0)
  }

  test("groupRanked without tie-break still selects the right value at each rank") {
    // heavy ties: value at any rank is unique even if rank assignment
    // within a tie run is arbitrary
    val df = (1 to 300).map(i => ("g", i % 5)).toDF("g", "v")
    val got = Ranks.groupRanked(df, "g", "v")
    assert(got.agg(count(lit(1))).as[Long].head === 300L)
    assert(got.select(countDistinct("rn")).as[Long].head === 300L)
    // ranks 1..60 hold v=0, 61..120 hold v=1, ...
    val bad = got.filter(col("v") =!= floor((col("rn") - 1) / 60)).count()
    assert(bad === 0L)
  }

  test("groupRunningSum matches a per-group running window (total tie-break)") {
    val df = (1 to 400).map(i => (s"s${i % 4}", (i * 31) % 50, i.toLong, i))
      .toDF("g", "o", "v", "id")
    val got = Ranks.groupRunningSum(df, "g", "o", "v", Seq("id"))
      .select("g", "o", "v", "id", "rn", "n", "rsum")
    val w = Window.partitionBy("g").orderBy(col("o"), col("id"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("rsum", sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("g", "o", "v", "id", "rn", "n", "rsum")
    assert(got.except(want).count() === 0)
    assert(want.except(got).count() === 0)
  }

  test("groupRanked ranks are a contiguous 1..n per group") {
    val df = (1 to 97).map(i => (s"g${i % 2}", 97 - i, i)).toDF("g", "v", "id")
    val per = Ranks.groupRanked(df, "g", "v", Seq("id"))
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
}
