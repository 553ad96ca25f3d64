package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table

/** Round-4 widening, batch 15: weighted median over de-skewed running
  * weights, funnel time-to-convert quantiles, and a discount response
  * curve.
  */
object Extras18 {

  val all: Seq[QueryDef] = Seq(

    // Quantity-weighted median price per return flag: the smallest
    // value whose running weight reaches half the group total.
    // Selection by histogram refinement (ops/Quantiles): pass 1
    // sums weights into fixed-width price buckets (map-side
    // combined, GROUPS × BUCKETS output), a histogram-sized running
    // sum finds the crossing bucket and the weight before it, pass 2
    // re-scans that bucket alone for the exact crossing value — two
    // scans, no data-sized shuffle, no pinned frame, parallelism
    // independent of the 3-flag group cardinality. Replaces the
    // tie-collapse + Ranks.groupRunningSum form (the round-10 heavy
    // tail's #3 at 5.6 s official / 4.4 s hermetic; the rank input
    // was value-domain-bounded but still a corpus-wide shuffle).
    QueryDef("q216_weighted_median",
      (s, d) => {
        val li = table(s, d, "lineitem").select(
          col("l_returnflag").as("g"),
          expr("CAST(floor(l_extendedprice * 100.0) AS BIGINT)").as("v_c"),
          expr("CAST(floor(l_quantity) AS BIGINT)").as("wt"))
        graft.ops.Quantiles.groupWeightedMedian(li, "g", col("v_c"), col("wt"))
          .select(col("g"), col("w_total"),
            col("median").cast("long").as("wmedian_c")) // exact: integer cents < 2^53
          .orderBy("g")
      },
      Some("""WITH li AS (
                SELECT l_returnflag AS g,
                  CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS v_c,
                  CAST(floor(l_quantity) AS BIGINT) AS wt
                FROM lineitem),
              x AS (
                SELECT g, v_c, wt,
                  SUM(wt) OVER (PARTITION BY g ORDER BY v_c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum,
                  SUM(wt) OVER (PARTITION BY g) AS w_total
                FROM li)
              SELECT g, CAST(MAX(w_total) AS BIGINT) AS w_total,
                CAST(MIN(CASE WHEN 2 * rsum >= w_total THEN v_c END) AS BIGINT)
                  AS wmedian_c
              FROM x GROUP BY g ORDER BY g""")),

    // Funnel latency: whole-hour gaps from first view to first
    // subsequent purchase, with exact p50/p90 over the converting
    // users (de-skewed global ranks; quantile ranks are the same
    // integer formulas in both engines).
    QueryDef("q217_time_to_convert",
      (s, d) => {
        val ev = table(s, d, "events")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t_view"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(v, "user_id")
          .filter(col("ts") > col("t_view"))
          .groupBy("user_id").agg(min("ts").as("t_buy"))
        val dlt = v.join(p, "user_id")
          .select(expr("(CAST(CAST(t_buy AS TIMESTAMP) AS LONG)" +
            " - CAST(CAST(t_view AS TIMESTAMP) AS LONG)) div 3600").as("hrs"))
          .withColumn("g", lit(1))
        graft.ops.Ranks.groupRanked(dlt, "g", "hrs", Seq.empty)
          .agg(max("n").as("n_converted"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("hrs"))).as("p50_h"),
            max(when(col("rn") === expr("(9 * n + 9) div 10"), col("hrs"))).as("p90_h"))
      },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                         WHERE event_type = 'view' GROUP BY user_id),
              p AS (SELECT e.user_id, MIN(e.ts) AS t_buy
                    FROM events e JOIN v ON e.user_id = v.user_id
                    WHERE e.event_type = 'purchase' AND e.ts > v.t_view
                    GROUP BY e.user_id),
              d AS (SELECT date_diff('second', v.t_view, p.t_buy) // 3600 AS hrs
                    FROM v JOIN p ON v.user_id = p.user_id),
              r AS (SELECT hrs, row_number() OVER (ORDER BY hrs) AS rn,
                      COUNT(*) OVER () AS n FROM d)
              SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
                CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN hrs END) AS BIGINT) AS p50_h,
                CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN hrs END) AS BIGINT)
                  AS p90_h
              FROM r""")),

    // Discount response curve: per discount level (bp), item count,
    // quantity, revenue cents, average item revenue, and share of
    // total revenue — the pricing-elasticity readout. One aggregation
    // plus a broadcast scalar total.
    QueryDef("q218_discount_response",
      (s, d) => {
        val li = table(s, d, "lineitem").select(
          expr("CAST(floor(l_discount * 10000.0) AS BIGINT)").as("disc_bp"),
          expr("CAST(floor(l_quantity) AS BIGINT)").as("qty"),
          expr("CAST(floor(l_extendedprice * 100.0) AS BIGINT)" +
            " * (10000 - CAST(floor(l_discount * 10000.0) AS BIGINT)) div 10000")
            .as("rev_c"))
          .transform(graft.ops.Pinned.pin) // total + per-level rollup
        val t = li.agg(sum("rev_c").as("total_c"))
        li.groupBy("disc_bp")
          .agg(count(lit(1)).as("n_items"), sum("qty").as("total_qty"),
            sum("rev_c").as("revenue_c"))
          .crossJoin(broadcast(t))
          .withColumn("avg_item_c", expr("revenue_c div n_items"))
          .withColumn("rev_share_bp", expr("revenue_c * 10000 div total_c"))
          .select("disc_bp", "n_items", "total_qty", "revenue_c",
            "avg_item_c", "rev_share_bp")
          .orderBy("disc_bp")
      },
      Some("""WITH li AS (
                SELECT CAST(floor(l_discount * 10000.0) AS BIGINT) AS disc_bp,
                  CAST(floor(l_quantity) AS BIGINT) AS qty,
                  CAST(floor(l_extendedprice * 100.0) AS BIGINT)
                    * (10000 - CAST(floor(l_discount * 10000.0) AS BIGINT))
                    // 10000 AS rev_c
                FROM lineitem),
              t AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS total_c FROM li)
              SELECT disc_bp, CAST(COUNT(*) AS BIGINT) AS n_items,
                CAST(SUM(qty) AS BIGINT) AS total_qty,
                CAST(SUM(rev_c) AS BIGINT) AS revenue_c,
                CAST(SUM(rev_c) // COUNT(*) AS BIGINT) AS avg_item_c,
                CAST(SUM(rev_c) * 10000 // t.total_c AS BIGINT) AS rev_share_bp
              FROM li CROSS JOIN t
              GROUP BY disc_bp, t.total_c ORDER BY disc_bp""")),

    // Weekly price bands: exact p25/p50/p75 of order totals per week.
    // Unlike the FIXED 5-value priority groups (q84/q176, de-skewed),
    // the week key's cardinality GROWS with the data — a per-week
    // rank window keeps parallelism proportional to the time span, so
    // the plain window is the right plan here (and the cheaper one).
    QueryDef("q219_weekly_bands",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("wk").orderBy("p_c")
        table(s, d, "orders")
          .select(trunc(col("o_orderdate").cast(org.apache.spark.sql.types.DateType), "week").as("wk"),
            expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("p_c"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("wk")))
          .groupBy(date_format(col("wk"), "yyyy-MM-dd").as("week"))
          .agg(max("n").as("n_orders"),
            max(when(col("rn") === expr("(n + 3) div 4"), col("p_c"))).as("p25_c"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("p_c"))).as("p50_c"),
            max(when(col("rn") === expr("(3 * n + 3) div 4"), col("p_c"))).as("p75_c"))
          .orderBy("week")
      },
      Some("""WITH o AS (
                SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
                  CAST(floor(o_totalprice * 100.0) AS BIGINT) AS p_c
                FROM orders),
              r AS (
                SELECT wk, p_c,
                  row_number() OVER (PARTITION BY wk ORDER BY p_c) AS rn,
                  COUNT(*) OVER (PARTITION BY wk) AS n
                FROM o)
              SELECT STRFTIME(wk, '%Y-%m-%d') AS week,
                CAST(MAX(n) AS BIGINT) AS n_orders,
                CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN p_c END) AS BIGINT) AS p25_c,
                CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN p_c END) AS BIGINT) AS p50_c,
                CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN p_c END) AS BIGINT) AS p75_c
              FROM r GROUP BY wk ORDER BY week"""))
  )
}
