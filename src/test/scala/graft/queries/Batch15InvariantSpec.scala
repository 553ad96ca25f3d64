package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Invariants for the batch-15 operators. */
class Batch15InvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q216: weighted median lies inside the value range; weights conserve") {
    val li = QueryDef.table(spark, sf, "lineitem")
      .select(col("l_returnflag").as("g"),
        expr("CAST(floor(l_extendedprice * 100.0) AS BIGINT)").as("v_c"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("wt"))
    val truth = li.groupBy("g")
      .agg(min("v_c").as("lo"), max("v_c").as("hi"), sum("wt").as("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    val rows = SparkEntry.queries("q216_weighted_median")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = truth(r.getString(0))
      assert(r.getAs[Long]("w_total") === t.getAs[Long]("w"), "weight books")
      val m = r.getAs[Long]("wmedian_c")
      assert(m >= t.getAs[Long]("lo") && m <= t.getAs[Long]("hi"))
      // at least half the weight sits at or below the weighted median
      val below = li.filter(col("g") === r.getString(0) && col("v_c") <= m)
        .agg(sum("wt")).head().getLong(0)
      assert(2 * below >= t.getAs[Long]("w"), "median must cover half the weight")
    }
  }

  test("q217: quantiles are ordered and converters bounded by viewers") {
    val r = SparkEntry.queries("q217_time_to_convert")(spark, sf).head()
    assert(r.getAs[Long]("p50_h") <= r.getAs[Long]("p90_h"))
    val viewers = QueryDef.table(spark, sf, "events")
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(r.getAs[Long]("n_converted") <= viewers)
    assert(r.getAs[Long]("n_converted") > 0L)
  }

  test("q218: revenue shares and counts reconcile with the raw table") {
    val df = SparkEntry.queries("q218_discount_response")(spark, sf)
    val li = QueryDef.table(spark, sf, "lineitem")
    assert(df.agg(sum("n_items")).head().getLong(0) === li.count())
    val shares = df.agg(sum("rev_share_bp")).head().getLong(0)
    val k = df.count()
    // truncating bp per level: total in (10000 - k, 10000]
    assert(shares <= 10000L && shares > 10000L - k)
  }
}
