package graft.plans

import graft.SparkSpec
import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** The native as-of operator (AsOfJoin → AsOfJoinExec) against the
  * proven window/union composition (q54), plus its physical shape
  * and edge semantics.
  */
class AsOfJoinNativeSpec extends SparkSpec {

  import spark.implicits._

  private def purchases = Seq(
    // (user, id, t)
    (1L, 10L, 100L), (1L, 11L, 200L), (1L, 12L, 50L),
    (2L, 20L, 500L),
    (3L, 30L, 10L)
  ).toDF("user_id", "event_id", "t")

  private def clicks = Seq(
    (1L, 90L), (1L, 100L), (1L, 150L), // exact tie at 100 joins "at or before"
    (2L, 490L), (2L, 501L),            // 501 is too new for t=500
    (4L, 1L)                           // user with no purchases
  ).toDF("c_user", "c_t")

  test("matches the greatest right time <= left time; nulls otherwise") {
    val out = AsOf.joinAsOf(purchases, clicks,
      Seq("user_id"), Seq("c_user"), "t", "c_t")
      .select("user_id", "event_id", "c_t")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out === Set(
      (1L, 10L, 100L),  // tie: 100 <= 100 wins over 90
      (1L, 11L, 150L),
      (1L, 12L, -1L),   // nothing at or before 50
      (2L, 20L, 490L),  // 501 excluded
      (3L, 30L, -1L)))  // user 3 has no clicks at all
  }

  test("tolerance bounds the staleness window") {
    val out = AsOf.joinAsOf(purchases, clicks,
      Seq("user_id"), Seq("c_user"), "t", "c_t", toleranceMicros = Some(10L))
      .select("user_id", "event_id", "c_t")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // only matches within 10 ticks survive: 100→100 (0), 500→490 (10)
    assert(out === Set((10L, 100L), (11L, -1L), (12L, -1L), (20L, 490L), (30L, -1L)))
  }

  test("plans as AsOfJoinExec with one exchange per side") {
    val df = AsOf.joinAsOf(purchases, clicks,
      Seq("user_id"), Seq("c_user"), "t", "c_t")
    val physical = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(physical.contains("AsOfJoin"), s"expected native exec in:\n$physical")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(exchanges === 2, s"expected 2 exchanges, plan:\n$physical")
  }

  test("empty right side yields all-null right columns") {
    val out = AsOf.joinAsOf(purchases, clicks.filter(lit(false)),
      Seq("user_id"), Seq("c_user"), "t", "c_t")
    assert(out.count() === purchases.count())
    assert(out.filter(col("c_t").isNotNull).count() === 0L)
  }

  test("agrees with the window/union composition on real data") {
    val ev = graft.queries.QueryDef.table(spark, "/root/testdata/sf0.001", "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val native = AsOf.joinAsOf(p, c, Seq("user_id"), Seq("c_user"), "ts", "c_ts")
      .select(col("event_id"), col("c_ts"))
    // composed form: last click at or before each purchase (q54 shape)
    val tagged = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "click", 0).otherwise(1).as("kind"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val composed = tagged
      .withColumn("last_click_ts",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("last_click_ts"))
    val diff = native.except(composed).union(composed.except(native)).count()
    assert(diff === 0L, "native and composed as-of must agree row-for-row")
  }

  test("left-side filters push below the as-of node into the scan") {
    val ev = graft.queries.QueryDef.table(spark, "/root/testdata/sf0.001", "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val joined = AsOf.joinAsOf(p, c, Seq("user_id"), Seq("c_user"), "ts", "c_ts")
    val filtered = joined.filter(col("user_id") < 3)
    val optimized = filtered.queryExecution.optimizedPlan
    // the Filter must have commuted below the AsOfJoin node
    val filterAboveJoin = optimized.collectFirst {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, _: AsOfJoin)
        if cond.references.exists(_.name == "user_id") => true
    }.isDefined
    assert(!filterAboveJoin, s"left filter stayed above the join:\n$optimized")
    val pushedIntoLeft = optimized.collectFirst { case j: AsOfJoin => j.left }
      .exists(_.toString.contains("user_id"))
    assert(pushedIntoLeft, s"expected pushed left filter in:\n$optimized")
    // and semantics are unchanged vs filtering before the join
    val pre = AsOf.joinAsOf(p.filter(col("user_id") < 3), c,
      Seq("user_id"), Seq("c_user"), "ts", "c_ts")
    assert(filtered.except(pre).union(pre.except(filtered)).count() === 0L)
  }
}
