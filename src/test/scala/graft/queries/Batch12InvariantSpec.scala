package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Cross-cutting invariants for the batch-12 operators that the
  * row-hash oracle verifies only implicitly.
  */
class Batch12InvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q198: bitmap popcount distinct equals COUNT(DISTINCT) on every row") {
    val df = SparkEntry.queries("q198_bitmap_distinct")(spark, sf)
    val bad = df.filter(col("bitmap_distinct") =!= col("exact_distinct")).count()
    assert(bad === 0L, s"$bad event types where the bitmap distinct diverges")
  }

  test("q199: per-from transition probabilities sum to ~10000 bp (truncation-bounded)") {
    val df = SparkEntry.queries("q199_markov_transitions")(spark, sf)
    val sums = df.groupBy("from_type")
      .agg(sum("prob_bp").as("bp"), count(lit(1)).as("k"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      val bp = r.getAs[Long]("bp"); val k = r.getAs[Long]("k")
      // each of the k cells truncates < 1 bp; never exceeds 10000
      assert(bp <= 10000L && bp > 10000L - k,
        s"${r.getString(0)}: bp sum $bp outside (10000-$k, 10000]")
    }
  }

  test("q200: RFM conserves customers and money; quartile digits stay in 1..4") {
    val orders = QueryDef.table(spark, sf, "orders")
    val nCust = orders.select("o_custkey").distinct().count()
    val df = SparkEntry.queries("q200_rfm_segments")(spark, sf)
    val agg = df.agg(sum("n_customers"), sum("sum_monetary_c")).head()
    assert(agg.getLong(0) === nCust, "segment counts must partition the customers")
    val money = orders
      .agg(sum(expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)"))).head().getLong(0)
    assert(agg.getLong(1) === money, "segment money must sum to total order cents")
    val badDigit = df.filter(
      expr("rfm div 100 NOT BETWEEN 1 AND 4") ||
        expr("(rfm div 10) % 10 NOT BETWEEN 1 AND 4") ||
        expr("rfm % 10 NOT BETWEEN 1 AND 4")).count()
    assert(badDigit === 0L, "every RFM digit is a quartile score in 1..4")
  }

  test("q201: cumulative distinct users ends at the total distinct user count") {
    val df = SparkEntry.queries("q201_cum_distinct_users")(spark, sf)
    val last = df.orderBy(col("day").desc).select("cum_users").head().getLong(0)
    val total = QueryDef.table(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(last === total)
    // new_users must sum to the same total (days partition the users)
    assert(df.agg(sum("new_users")).head().getLong(0) === total)
  }

  test("q203: skew profile shares are consistent and cumulative share is monotone") {
    val df = SparkEntry.queries("q203_key_skew_profile")(spark, sf).collect()
    assert(df.nonEmpty)
    val cums = df.map(_.getAs[Long]("cum_bp"))
    assert(cums.sliding(2).forall { case Array(a, b) => a <= b; case _ => true },
      "cum_bp must be nondecreasing in rank order")
    assert(cums.last <= 10000L)
    val shares = df.map(_.getAs[Long]("share_bp"))
    assert(shares.sliding(2).forall { case Array(a, b) => a >= b; case _ => true },
      "share_bp must be nonincreasing (sorted by count desc)")
  }
}
