package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Round-4 widening, batch 10: temporal-join staleness semantics,
  * time-series imputation, seasonal baselines, and leaderboard churn.
  *
  * Determinism: every operator here is pure integer algebra over
  * epoch seconds / hour buckets and cent-scaled values — the
  * interpolation and the seasonal baselines are INTEGER (floor)
  * arithmetic, so no float enters at all.
  */
object Extras13 {

  val all: Seq[QueryDef] = Seq(

    // as-of join with max staleness (the feature-store point-in-time
    // rule): each purchase takes the user's LAST click, but only if
    // it is at most 1 hour old — staler features are refused (NULL),
    // not silently served. Same single per-user ordered pass as the
    // plain as-of join; the tolerance is one integer comparison on
    // the matched row.
    QueryDef("q184_asof_tolerance",
      (s, d) => {
        val e = table(s, d, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts").cast(TimestampType).cast(LongType).as("sec"))
        val wPrev = Window.partitionBy("user_id")
          .orderBy(col("sec"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ck = when(col("event_type") === "click", col("sec"))
        val ckId = when(col("event_type") === "click", col("event_id"))
        val r = e
          .withColumn("psec", last(ck, ignoreNulls = true).over(wPrev))
          .withColumn("pid", last(ckId, ignoreNulls = true).over(wPrev))
          .filter(col("event_type") === "purchase")
        val fresh = col("pid").isNotNull && (col("sec") - col("psec")) <= 3600L
        r.select(col("user_id"), col("event_id").as("purchase_id"),
            when(fresh, col("pid")).as("click_id"),
            when(fresh, col("sec") - col("psec")).as("staleness_sec"),
            when(fresh, lit(1L)).otherwise(lit(0L)).as("matched"))
          .orderBy("user_id", "purchase_id")
      },
      Some("""WITH e AS (
                SELECT user_id, event_id, event_type,
                  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
                FROM events WHERE event_type IN ('purchase', 'click')),
              w AS (
                SELECT user_id, event_id, event_type, sec,
                  last_value(CASE WHEN event_type = 'click' THEN sec END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY sec, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS psec,
                  last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY sec, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pid
                FROM e),
              p AS (
                SELECT *, (pid IS NOT NULL AND sec - psec <= 3600) AS fresh
                FROM w WHERE event_type = 'purchase')
              SELECT user_id, event_id AS purchase_id,
                CASE WHEN fresh THEN pid END AS click_id,
                CASE WHEN fresh THEN sec - psec END AS staleness_sec,
                CASE WHEN fresh THEN 1 ELSE 0 END AS matched
              FROM p ORDER BY user_id, purchase_id""")),

    // time-series gap imputation: hourly purchase revenue per type on
    // the dense hour grid (q169's densification), interior silent
    // hours filled by INTEGER linear interpolation between the
    // surrounding observed hours; leading/trailing gaps stay NULL
    // (flagged 'edge'). The standard prep before differencing or
    // forecasting. One grid generation + one per-type ordered pass
    // (running prev/next observed state — the q164 machinery).
    QueryDef("q185_interpolate_gaps",
      (s, d) => {
        val e = table(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("ts").cast(TimestampType).cast(LongType).as("sec"),
            expr("CAST(floor(value * 100.0) AS BIGINT)").as("c"))
          .select(expr("sec div 3600").as("hour"), col("c"))
        val obs = e.groupBy("hour").agg(sum("c").as("rev_c"))
        val span = e.agg(min("hour").as("h0"), max("hour").as("h1"))
        val grid = span.select(explode(sequence(col("h0"), col("h1"))).as("hour"))
          .join(obs, Seq("hour"), "left")
        val ord = Window.orderBy("hour")
        val wPrev = ord.rowsBetween(Window.unboundedPreceding, -1)
        val wNext = ord.rowsBetween(1, Window.unboundedFollowing)
        // single-partition window is intentional HERE: the grid is
        // span-hours rows (post-aggregation, thousands at most) — at
        // scale this pass runs per series key, not globally
        val known = when(col("rev_c").isNotNull, col("hour"))
        val r = grid
          .withColumn("ph", last(known, ignoreNulls = true).over(wPrev))
          .withColumn("pv", last(when(col("rev_c").isNotNull, col("rev_c")),
            ignoreNulls = true).over(wPrev))
          .withColumn("nh", first(known, ignoreNulls = true).over(wNext))
          .withColumn("nv", first(when(col("rev_c").isNotNull, col("rev_c")),
            ignoreNulls = true).over(wNext))
        val interior = col("rev_c").isNull && col("ph").isNotNull && col("nh").isNotNull
        r.select(col("hour"),
            when(col("rev_c").isNotNull, col("rev_c"))
              .when(interior, col("pv") + expr(
                "(nv - pv) * (hour - ph) div (nh - ph)"))
              .as("filled_c"),
            when(col("rev_c").isNotNull, lit("obs"))
              .when(interior, lit("interp"))
              .otherwise(lit("edge")).as("source"))
          .orderBy("hour")
      },
      Some("""WITH e AS (
                SELECT date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600
                    AS hour,
                  CAST(floor(value * 100.0) AS BIGINT) AS c
                FROM events WHERE event_type = 'purchase'),
              obs AS (SELECT hour, CAST(SUM(c) AS BIGINT) AS rev_c
                      FROM e GROUP BY hour),
              span AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM e),
              grid AS (
                SELECT g.hour, o.rev_c
                FROM (SELECT unnest(range(h0, h1 + 1)) AS hour FROM span) g
                LEFT JOIN obs o ON o.hour = g.hour),
              r AS (
                SELECT hour, rev_c,
                  last_value(CASE WHEN rev_c IS NOT NULL THEN hour END IGNORE NULLS)
                    OVER (ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
                  last_value(rev_c IGNORE NULLS)
                    OVER (ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
                  first_value(CASE WHEN rev_c IS NOT NULL THEN hour END IGNORE NULLS)
                    OVER (ORDER BY hour ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh,
                  first_value(rev_c IGNORE NULLS)
                    OVER (ORDER BY hour ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
                FROM grid)
              SELECT hour,
                CASE WHEN rev_c IS NOT NULL THEN rev_c
                     WHEN ph IS NOT NULL AND nh IS NOT NULL
                       THEN pv + (nv - pv) * (hour - ph) // (nh - ph)
                END AS filled_c,
                CASE WHEN rev_c IS NOT NULL THEN 'obs'
                     WHEN ph IS NOT NULL AND nh IS NOT NULL THEN 'interp'
                     ELSE 'edge' END AS source
              FROM r ORDER BY hour""")),

    // seasonal baseline + residuals: expected purchase revenue per
    // hour-of-day (the 24-slot seasonal profile), and each concrete
    // hour's deviation from its slot's baseline — the de-seasonalized
    // signal an anomaly monitor thresholds. All integer: floor-mean
    // baselines, cent residuals. Two keyed aggregations (hour, then
    // hour-of-day) and a broadcast of the 24-row profile.
    QueryDef("q186_hod_baseline",
      (s, d) => {
        val hourly = table(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("ts").cast(TimestampType).cast(LongType).as("sec"),
            expr("CAST(floor(value * 100.0) AS BIGINT)").as("c"))
          .select(expr("sec div 3600").as("hour"), col("c"))
          .groupBy("hour").agg(sum("c").as("obs_c"))
          .withColumn("hod", expr("hour % 24"))
        val base = hourly.groupBy("hod")
          .agg(expr("sum(obs_c) div count(1)").as("base_c"))
        hourly.join(broadcast(base), "hod")
          .select(col("hour"), col("hod"), col("obs_c"), col("base_c"),
            (col("obs_c") - col("base_c")).as("resid_c"))
          .orderBy("hour")
      },
      Some("""WITH hourly AS (
                SELECT date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600
                    AS hour,
                  CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS obs_c
                FROM events WHERE event_type = 'purchase'
                GROUP BY 1),
              h2 AS (SELECT hour, hour % 24 AS hod, obs_c FROM hourly),
              base AS (
                SELECT hod, CAST(SUM(obs_c) AS BIGINT) // COUNT(*) AS base_c
                FROM h2 GROUP BY hod)
              SELECT h.hour, h.hod, h.obs_c, b.base_c,
                h.obs_c - b.base_c AS resid_c
              FROM h2 h JOIN base b ON b.hod = h.hod
              ORDER BY h.hour""")),

    // weekly leaderboard churn: top-10 parts by shipped revenue per
    // week, with each part's rank movement vs the previous week
    // (NULL = new entrant). The rank input is the AGGREGATED
    // (week, part) frame — bounded by calendar × catalog at any
    // corpus size, never corpus-sized — so a plain per-week window
    // is the right tool (each week's task ranks one catalog's rows);
    // the de-skewed range machinery is for rank inputs that grow
    // with the fact table. The churn join touches 10 rows per week.
    // The "trending items" op every marketplace dashboard runs.
    QueryDef("q187_rank_churn",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wk = table(s, d, "lineitem")
          .select(
            col("l_shipdate").cast(TimestampType).cast(LongType).as("sec"),
            col("l_partkey"),
            expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
              .as("c"))
          .select(expr("sec div 604800").as("week"), col("l_partkey"), col("c"))
          .groupBy("week", "l_partkey").agg(sum("c").as("rev_c"))
        val w = Window.partitionBy("week")
          .orderBy(col("rev_c").desc, col("l_partkey"))
        // the top-10-per-week frame is ~10 rows/week; localCheckpoint
        // pins it so the self-join (current vs previous week) doesn't
        // re-execute the lineitem aggregation + rank twice
        val ranked = wk
          .withColumn("rank", row_number().over(w).cast(LongType))
          .filter(col("rank") <= 10)
          .select(col("week"), col("l_partkey"), col("rev_c"), col("rank"))
          .transform(graft.ops.Pinned.pin)
        val prev = ranked.select(col("week").as("pw"),
          col("l_partkey").as("pk"), col("rank").as("prev_rank"))
        ranked
          .join(prev,
            col("l_partkey") === col("pk") && col("pw") === col("week") - 1,
            "left")
          .select(col("week"), col("l_partkey").as("part"),
            col("rev_c"), col("rank"), col("prev_rank"),
            (col("prev_rank") - col("rank")).as("delta"))
          .orderBy("week", "rank")
      },
      Some("""WITH wk AS (
                SELECT date_diff('second', TIMESTAMP '1970-01-01 00:00:00', l_shipdate)
                    // 604800 AS week,
                  l_partkey,
                  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0)
                    AS BIGINT)) AS BIGINT) AS rev_c
                FROM lineitem GROUP BY 1, 2),
              ranked AS (
                SELECT week, l_partkey, rev_c,
                  ROW_NUMBER() OVER (PARTITION BY week
                    ORDER BY rev_c DESC, l_partkey) AS rank
                FROM wk QUALIFY rank <= 10)
              SELECT c.week, c.l_partkey AS part, c.rev_c,
                CAST(c.rank AS BIGINT) AS rank,
                CAST(p.rank AS BIGINT) AS prev_rank,
                CAST(p.rank - c.rank AS BIGINT) AS delta
              FROM ranked c
              LEFT JOIN ranked p
                ON p.l_partkey = c.l_partkey AND p.week = c.week - 1
              ORDER BY c.week, c.rank""")),

    // hierarchical contribution (ratio-to-report at two levels):
    // every nation's revenue share WITHIN its region and every
    // region's share of the total, in integer basis points. One fact
    // aggregation to nation grain; region and grand totals derive
    // from it and broadcast back — the fact shuffles once.
    QueryDef("q188_contribution",
      (s, d) => {
        val rev = table(s, d, "orders")
          .join(broadcast(table(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name"), col("n_name"),
            expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("c"))
          .groupBy("r_name", "n_name").agg(sum("c").as("rev_c"))
        val regTot = rev.groupBy("r_name").agg(sum("rev_c").as("reg_c"))
        val tot = rev.agg(sum("rev_c").as("tot_c"))
        rev.join(broadcast(regTot), "r_name")
          .crossJoin(broadcast(tot))
          .select(col("r_name"), col("n_name"), col("rev_c"),
            expr("rev_c * 10000 div reg_c").as("share_of_region_bp"),
            expr("reg_c * 10000 div tot_c").as("region_share_bp"))
          .orderBy("r_name", "n_name")
      },
      Some("""WITH rev AS (
                SELECT r_name, n_name,
                  CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                    AS rev_c
                FROM orders
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
                GROUP BY r_name, n_name),
              reg AS (SELECT r_name, CAST(SUM(rev_c) AS BIGINT) AS reg_c
                      FROM rev GROUP BY r_name),
              tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS tot_c FROM rev)
              SELECT v.r_name, v.n_name, v.rev_c,
                (v.rev_c * 10000) // g.reg_c AS share_of_region_bp,
                (g.reg_c * 10000) // t.tot_c AS region_share_bp
              FROM rev v JOIN reg g ON g.r_name = v.r_name CROSS JOIN tot t
              ORDER BY v.r_name, v.n_name""")),

    // ABC / Pareto classification: parts ranked by revenue, classed A
    // while cumulative share <= 80%, B to 95%, else C — the inventory
    // 80/20 analysis. The cumulative sum comes from the de-skewed
    // running-sum pass (Ranks.groupRunningSum over a constant group:
    // range-partitioned by the VALUE, no single-reducer window);
    // thresholds are integer basis points. Emits the three class
    // summaries, however many parts exist.
    QueryDef("q189_abc_pareto",
      (s, d) => {
        val rev = table(s, d, "lineitem")
          .select(col("l_partkey"),
            expr("CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
              .as("c"))
          .groupBy("l_partkey").agg(sum("c").as("rev_c"))
          .withColumn("g", lit("all"))
          .withColumn("negrev", -col("rev_c"))
        val run = graft.ops.Ranks.groupRunningSum(
          rev, "g", "negrev", "rev_c", Seq("l_partkey"))
        val tot = rev.agg(sum("rev_c").as("tot_c"))
        run.crossJoin(broadcast(tot))
          .withColumn("cum_bp", expr("rsum * 10000 div tot_c"))
          .withColumn("cls",
            when(col("cum_bp") <= 8000, "A")
              .when(col("cum_bp") <= 9500, "B")
              .otherwise(lit("C")))
          .groupBy("cls")
          .agg(count(lit(1)).as("n_parts"), sum("rev_c").as("class_rev_c"),
            min("rn").as("first_rank"), max("rn").as("last_rank"))
          .orderBy("cls")
      },
      Some("""WITH rev AS (
                SELECT l_partkey,
                  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0)
                    AS BIGINT)) AS BIGINT) AS rev_c
                FROM lineitem GROUP BY l_partkey),
              run AS (
                SELECT l_partkey, rev_c,
                  ROW_NUMBER() OVER (ORDER BY rev_c DESC, l_partkey) AS rn,
                  SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum
                FROM rev),
              tot AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS tot_c FROM rev),
              classed AS (
                SELECT rn, rev_c,
                  CASE WHEN (rsum * 10000) // t.tot_c <= 8000 THEN 'A'
                       WHEN (rsum * 10000) // t.tot_c <= 9500 THEN 'B'
                       ELSE 'C' END AS cls
                FROM run CROSS JOIN tot t)
              SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
                CAST(SUM(rev_c) AS BIGINT) AS class_rev_c,
                CAST(MIN(rn) AS BIGINT) AS first_rank,
                CAST(MAX(rn) AS BIGINT) AS last_rank
              FROM classed GROUP BY cls ORDER BY cls""")),

    // growth accounting: weekly actives split into NEW (first week of
    // activity) vs RETURNING users. Two keyed aggregations — per-user
    // first week (broadcastable per-user grain collapses to distinct
    // users), then per-week counts. The standard weekly growth panel.
    QueryDef("q190_new_returning",
      (s, d) => {
        val uw = table(s, d, "events")
          .select(col("user_id"),
            col("ts").cast(TimestampType).cast(LongType).as("sec"))
          .select(col("user_id"), expr("sec div 604800").as("week"))
          .distinct()
        val first = uw.groupBy("user_id").agg(min("week").as("first_week"))
        uw.join(first, "user_id")
          .groupBy("week")
          .agg(count(lit(1)).as("n_active"),
            count(when(col("week") === col("first_week"), 1)).as("n_new"))
          .withColumn("n_returning", col("n_active") - col("n_new"))
          .orderBy("week")
      },
      Some("""WITH uw AS (
                SELECT DISTINCT user_id,
                  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) // 604800
                    AS week
                FROM events),
              f AS (SELECT user_id, MIN(week) AS first_week
                    FROM uw GROUP BY user_id)
              SELECT uw.week, CAST(COUNT(*) AS BIGINT) AS n_active,
                CAST(COUNT(CASE WHEN uw.week = f.first_week THEN 1 END) AS BIGINT)
                  AS n_new,
                CAST(COUNT(*) - COUNT(CASE WHEN uw.week = f.first_week THEN 1 END)
                  AS BIGINT) AS n_returning
              FROM uw JOIN f ON f.user_id = uw.user_id
              GROUP BY uw.week ORDER BY uw.week""")),

    // market-basket association rules (Apriori level 2): for part
    // pairs co-purchased in >= 2 orders, support, both confidences,
    // and lift — ALL in integer basis points (lift_bp = c_ab * N *
    // 10000 div (c_a * c_b); int64-safe at these grains). The pair
    // expansion is the bounded per-order self-join (baskets are
    // business-bounded — the q130 edge argument); item and basket
    // counts collapse first and broadcast. Top-100 by support keeps
    // the report bounded.
    QueryDef("q191_basket_rules",
      (s, d) => {
        val m = table(s, d, "lineitem")
          .select(col("l_orderkey").as("ord"), col("l_partkey").as("item"))
          .distinct()
          .transform(graft.ops.Pinned.pin) // pair expansion + item counts + basket count
        // basket-collect pair expansion (the coOccurrenceEdges slice
        // pattern), NOT a self-join on ord: the old join's build-side
        // estimate sat exactly at the AQE broadcast threshold (~10 MB
        // at sf0.1), so the plan coin-flipped BHJ/SMJ across runs —
        // the r14/r15 bimodality (1.4 s vs 3.2 s, same code). One
        // map-side-combined collect per basket + in-row u<v expansion
        // has no join to flip and one fewer shuffle; items are
        // distinct per basket already, so sorted-list slicing emits
        // each unordered pair exactly once — counts identical.
        val pairs = m.groupBy("ord")
          .agg(sort_array(collect_list(col("item"))).as("__is"))
          .select(posexplode(col("__is")).as(Seq("__x", "part_a")), col("__is"))
          .select(col("part_a"),
            explode(slice(col("__is"), col("__x") + 2, size(col("__is")))).as("part_b"))
          .groupBy("part_a", "part_b")
          .agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 2)
        val items = m.groupBy("item").agg(count(lit(1)).as("ci"))
        val n = m.select(countDistinct("ord").as("n_orders"))
        pairs
          .join(broadcast(items.select(col("item").as("part_a"), col("ci").as("c_a"))),
            "part_a")
          .join(broadcast(items.select(col("item").as("part_b"), col("ci").as("c_b"))),
            "part_b")
          .crossJoin(broadcast(n))
          .select(col("part_a"), col("part_b"), col("c_ab"),
            expr("c_ab * 10000 div n_orders").as("support_bp"),
            expr("c_ab * 10000 div c_a").as("conf_ab_bp"),
            expr("c_ab * 10000 div c_b").as("conf_ba_bp"),
            expr("c_ab * n_orders * 10000 div (c_a * c_b)").as("lift_bp"))
          .orderBy(col("c_ab").desc, col("part_a"), col("part_b"))
          .limit(100)
      },
      Some("""WITH m AS (
                SELECT DISTINCT l_orderkey AS ord, l_partkey AS item FROM lineitem),
              pairs AS (
                SELECT a.item AS part_a, b.item AS part_b, COUNT(*) AS c_ab
                FROM m a JOIN m b ON a.ord = b.ord AND a.item < b.item
                GROUP BY a.item, b.item HAVING COUNT(*) >= 2),
              items AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS ci
                        FROM m GROUP BY item),
              n AS (SELECT CAST(COUNT(DISTINCT ord) AS BIGINT) AS n_orders FROM m)
              SELECT p.part_a, p.part_b, CAST(p.c_ab AS BIGINT) AS c_ab,
                (p.c_ab * 10000) // n.n_orders AS support_bp,
                (p.c_ab * 10000) // ia.ci AS conf_ab_bp,
                (p.c_ab * 10000) // ib.ci AS conf_ba_bp,
                (p.c_ab * n.n_orders * 10000) // (ia.ci * ib.ci) AS lift_bp
              FROM pairs p
              JOIN items ia ON ia.item = p.part_a
              JOIN items ib ON ib.item = p.part_b
              CROSS JOIN n
              ORDER BY c_ab DESC, part_a, part_b
              LIMIT 100""")))
}
