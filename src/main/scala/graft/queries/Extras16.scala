package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Round-4 widening, batch 13: training-pipeline curation operators —
  * exact-proportion train/val/test split, cohort LTV curves, blocked
  * sorted-neighborhood near-dup candidates, change-point screening,
  * SAX symbolization with motif counting, and sessionized conversion
  * attribution.
  *
  * Determinism: split boundaries and quartile symbols come from
  * md5/rank integer formulas (never ntile or floats); money is cents,
  * shares are basis points, SAX words are bit-packed integers.
  */
object Extras16 {

  val all: Seq[QueryDef] = Seq(

    // Exact-proportion stratified train/val/test split: per-language
    // strata, docs ordered by a deterministic md5 key, ranks cut at
    // integer 80%/90% boundaries — counts are exact by construction
    // (hash-modulo splits are only approximate). The global per-
    // stratum rank comes from Ranks.groupRanked (range repartition —
    // parallelism stays at the partition count, no per-stratum
    // single-reducer window).
    QueryDef("q204_train_split",
      (s, d) => {
        val docs = table(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            md5(col("doc_id").cast(StringType)).as("hsh"))
        graft.ops.Ranks.groupRanked(docs, "lang", "hsh", Seq("doc_id"))
          .select(col("doc_id"), col("lang"),
            when(col("rn") <= expr("(n * 8000) div 10000"), "train")
              .when(col("rn") <= expr("(n * 9000) div 10000"), "val")
              .otherwise("test").as("split"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
                SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hsh
                FROM documents),
              r AS (
                SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang ORDER BY hsh, doc_id) AS rn,
                  COUNT(*) OVER (PARTITION BY lang) AS n
                FROM h)
              SELECT doc_id, lang,
                CASE WHEN rn <= (n * 8000) // 10000 THEN 'train'
                     WHEN rn <= (n * 9000) // 10000 THEN 'val'
                     ELSE 'test' END AS split
              FROM r ORDER BY doc_id""")),

    // Weekly-cohort LTV curve: purchasers cohorted by first purchase
    // week; per (cohort, age) revenue, running cumulative, and
    // per-user LTV in integer cents. The running window is over the
    // aggregated cohort × age frame — never data-sized.
    QueryDef("q205_cohort_ltv",
      (s, d) => {
        val p = table(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            trunc(col("ts").cast(DateType), "week").as("wk"),
            expr("CAST(floor(value * 100.0) AS BIGINT)").as("rev_c"))
        // cohort frame: one aggregation, two consumers (sizes + join)
        val cohort = p.groupBy("user_id").agg(min("wk").as("cohort_week"))
          .transform(graft.ops.Pinned.pin)
        val sizes = cohort.groupBy("cohort_week")
          .agg(count(lit(1)).as("cohort_users"))
        val rev = p.join(cohort, "user_id")
          .groupBy(col("cohort_week"),
            (datediff(col("wk"), col("cohort_week")) / 7).cast(LongType).as("age_w"))
          .agg(sum("rev_c").as("revenue_c"))
        val cum = Window.partitionBy("cohort_week").orderBy("age_w")
          .rowsBetween(Window.unboundedPreceding, 0)
        rev.join(broadcast(sizes), "cohort_week")
          .withColumn("cum_revenue_c", sum("revenue_c").over(cum))
          .withColumn("ltv_per_user_c", expr("cum_revenue_c div cohort_users"))
          .select("cohort_week", "age_w", "revenue_c", "cum_revenue_c",
            "ltv_per_user_c", "cohort_users")
          .orderBy("cohort_week", "age_w")
      },
      Some("""WITH p AS (
                SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
                  CAST(floor(value * 100.0) AS BIGINT) AS rev_c
                FROM events WHERE event_type = 'purchase'),
              cohort AS (
                SELECT user_id, MIN(wk) AS cohort_week FROM p GROUP BY user_id),
              sizes AS (
                SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
                FROM cohort GROUP BY cohort_week),
              rev AS (
                SELECT c.cohort_week,
                  CAST(date_diff('day', c.cohort_week, p.wk) // 7 AS BIGINT) AS age_w,
                  CAST(SUM(p.rev_c) AS BIGINT) AS revenue_c
                FROM p JOIN cohort c ON p.user_id = c.user_id
                GROUP BY c.cohort_week, age_w)
              SELECT r.cohort_week, r.age_w, r.revenue_c,
                CAST(SUM(r.revenue_c) OVER (PARTITION BY r.cohort_week ORDER BY r.age_w
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cum_revenue_c,
                CAST(SUM(r.revenue_c) OVER (PARTITION BY r.cohort_week ORDER BY r.age_w
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  // s.cohort_users AS BIGINT) AS ltv_per_user_c,
                s.cohort_users
              FROM rev r JOIN sizes s ON r.cohort_week = s.cohort_week
              ORDER BY r.cohort_week, r.age_w""")),

    // Blocked sorted-neighborhood near-dup candidates: docs sort by a
    // 40-char key within 4-char prefix blocks; each doc probes its
    // next two neighbors with a 30-char edit-distance gate. The
    // classic SNM tradeoff, made Spark-shaped: the window partitions
    // by block (at 100 TB you lengthen the block prefix to keep
    // blocks ≪ partition-sized; cross-block neighbors are forfeited
    // by design — that is SNM's recall/parallelism dial).
    QueryDef("q206_snm_neardup",
      (s, d) => {
        val k = table(s, d, "documents").select(col("doc_id"),
          substring(col("text"), 1, 4).as("blk"),
          substring(col("text"), 1, 40).as("key"),
          substring(col("text"), 1, 30).as("probe"))
        val w = Window.partitionBy("blk").orderBy(col("key"), col("doc_id"))
        val nbrs = k
          .withColumn("nbr1_id", lead(col("doc_id"), 1).over(w))
          .withColumn("nbr1_probe", lead(col("probe"), 1).over(w))
          .withColumn("nbr2_id", lead(col("doc_id"), 2).over(w))
          .withColumn("nbr2_probe", lead(col("probe"), 2).over(w))
        val p1 = nbrs.filter(col("nbr1_id").isNotNull)
          .select(col("doc_id").as("doc_id1"), col("nbr1_id").as("doc_id2"),
            levenshtein(col("probe"), col("nbr1_probe")).cast(LongType).as("dist"))
        val p2 = nbrs.filter(col("nbr2_id").isNotNull)
          .select(col("doc_id").as("doc_id1"), col("nbr2_id").as("doc_id2"),
            levenshtein(col("probe"), col("nbr2_probe")).cast(LongType).as("dist"))
        p1.union(p2).filter(col("dist") <= 6)
          .orderBy("doc_id1", "doc_id2")
      },
      Some("""WITH k AS (
                SELECT doc_id, substring(text, 1, 4) AS blk,
                  substring(text, 1, 40) AS key, substring(text, 1, 30) AS probe
                FROM documents),
              w AS (
                SELECT doc_id, blk, key, probe,
                  lead(doc_id, 1) OVER (PARTITION BY blk ORDER BY key, doc_id) AS nbr1_id,
                  lead(probe, 1)  OVER (PARTITION BY blk ORDER BY key, doc_id) AS nbr1_probe,
                  lead(doc_id, 2) OVER (PARTITION BY blk ORDER BY key, doc_id) AS nbr2_id,
                  lead(probe, 2)  OVER (PARTITION BY blk ORDER BY key, doc_id) AS nbr2_probe
                FROM k),
              pairs AS (
                SELECT doc_id AS doc_id1, nbr1_id AS doc_id2,
                  CAST(levenshtein(probe, nbr1_probe) AS BIGINT) AS dist
                FROM w WHERE nbr1_id IS NOT NULL
                UNION ALL
                SELECT doc_id, nbr2_id, CAST(levenshtein(probe, nbr2_probe) AS BIGINT)
                FROM w WHERE nbr2_id IS NOT NULL)
              SELECT doc_id1, doc_id2, dist FROM pairs
              WHERE dist <= 6
              ORDER BY doc_id1, doc_id2""")),

    // Change-point screen: per-user daily cent totals; a day is
    // scored by (next-3-day sum − prior-3-day sum), full windows
    // only. Top-20 absolute shifts. Pure integer window arithmetic;
    // the window partitions by user_id (high cardinality).
    QueryDef("q207_change_points",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("day")
        val pre = byUser.rowsBetween(-3, -1)
        val post = byUser.rowsBetween(0, 2)
        table(s, d, "events")
          .groupBy(col("user_id"), col("ts").cast(DateType).as("day"))
          .agg(sum(expr("CAST(floor(value * 100.0) AS BIGINT)")).as("v_c"))
          .withColumn("pre_sum", sum("v_c").over(pre))
          .withColumn("pre_n", count("v_c").over(pre))
          .withColumn("post_sum", sum("v_c").over(post))
          .withColumn("post_n", count("v_c").over(post))
          .filter(col("pre_n") === 3 && col("post_n") === 3)
          .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            (col("post_sum") - col("pre_sum")).as("shift_c"))
          .orderBy(abs(col("shift_c")).desc, col("user_id"), col("day"))
          .limit(20)
      },
      Some("""WITH daily AS (
                SELECT user_id, CAST(ts AS DATE) AS day,
                  CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS v_c
                FROM events GROUP BY user_id, day),
              w AS (
                SELECT user_id, day, v_c,
                  SUM(v_c)   OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS pre_sum,
                  COUNT(v_c) OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS pre_n,
                  SUM(v_c)   OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS post_sum,
                  COUNT(v_c) OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS post_n
                FROM daily)
              SELECT user_id, STRFTIME(day, '%Y-%m-%d') AS day,
                CAST(post_sum - pre_sum AS BIGINT) AS shift_c
              FROM w WHERE pre_n = 3 AND post_n = 3
              ORDER BY abs(post_sum - pre_sum) DESC, user_id, day
              LIMIT 20""")),

    // SAX-style symbolization + motif counting: each user's activity
    // collapses to 8 equal time buckets (PAA), each bucket gets its
    // within-user quartile symbol (rank formula — not ntile), and the
    // 8 symbols bit-pack (3 bits/bucket, absent = 0) into ONE BIGINT
    // word whose construction is an order-independent SUM — no
    // collect_list ordering to diverge. Motifs = word frequencies.
    QueryDef("q208_sax_motifs",
      (s, d) => {
        val e = table(s, d, "events").select(col("user_id"),
          col("ts").cast(TimestampType).cast(LongType).as("sec"),
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("v_c"))
        val t = e.agg(min("sec").as("tmin"), max("sec").as("tmax"))
        val b = e.crossJoin(broadcast(t))
          .groupBy(col("user_id"),
            expr("CAST((sec - tmin) * 8 div (tmax - tmin + 1) AS INT)").as("bucket"))
          .agg(sum("v_c").as("sum_c"))
        val sym = b.withColumn("s",
          expr("((row_number() OVER (PARTITION BY user_id ORDER BY sum_c, bucket) - 1) * 4)" +
            " div count(*) OVER (PARTITION BY user_id)"))
        sym.groupBy("user_id")
          .agg(sum(expr("shiftleft(CAST(s + 1 AS BIGINT), 3 * bucket)")).as("sax_word"))
          .groupBy("sax_word").agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("sax_word"))
          .limit(20)
      },
      Some("""WITH e AS (
                SELECT user_id,
                  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
                  CAST(floor(value * 100.0) AS BIGINT) AS v_c
                FROM events),
              t AS (SELECT MIN(sec) AS tmin, MAX(sec) AS tmax FROM e),
              b AS (
                SELECT user_id,
                  CAST((sec - t.tmin) * 8 // (t.tmax - t.tmin + 1) AS INT) AS bucket,
                  CAST(SUM(v_c) AS BIGINT) AS sum_c
                FROM e CROSS JOIN t GROUP BY user_id, bucket),
              sym AS (
                SELECT user_id, bucket,
                  ((row_number() OVER (PARTITION BY user_id ORDER BY sum_c, bucket) - 1) * 4)
                    // COUNT(*) OVER (PARTITION BY user_id) AS s
                FROM b),
              words AS (
                SELECT user_id,
                  CAST(SUM((s + 1) << (3 * bucket)) AS BIGINT) AS sax_word
                FROM sym GROUP BY user_id)
              SELECT sax_word, CAST(COUNT(*) AS BIGINT) AS n_users
              FROM words GROUP BY sax_word
              ORDER BY n_users DESC, sax_word LIMIT 20""")),

    // Sessionized conversion by entry event: 30-minute-gap sessions
    // (q27's sessionizer), each labeled with its first event type and
    // whether it converted (contains a purchase); conversion rate per
    // entry type in basis points. One user-keyed shuffle shared by
    // all three windows.
    QueryDef("q209_session_conversion",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val flag = when(col("ts") - lag(col("ts"), 1).over(byUser)
          > expr("INTERVAL '30' MINUTE"), 1L).otherwise(0L)
        val sessions = table(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("flag", flag)
          .withColumn("session_id", sum("flag").over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
        val bySess = Window.partitionBy("user_id", "session_id")
        sessions
          .withColumn("rn", row_number().over(
            bySess.orderBy(col("ts"), col("event_id"))))
          .withColumn("converted",
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(bySess))
          .filter(col("rn") === 1)
          .groupBy(col("event_type").as("entry_type"))
          .agg(count(lit(1)).as("n_sessions"), sum("converted").as("n_converted"))
          .withColumn("conv_bp", expr("n_converted * 10000 div n_sessions"))
          .orderBy("entry_type")
      },
      Some("""WITH x AS (
                SELECT user_id, event_id, ts, event_type,
                  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS flag
                FROM events),
              s AS (
                SELECT user_id, event_id, ts, event_type,
                  CAST(SUM(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS session_id
                FROM x),
              marked AS (
                SELECT user_id, session_id, event_type,
                  row_number() OVER (PARTITION BY user_id, session_id
                    ORDER BY ts, event_id) AS rn,
                  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id, session_id) AS converted
                FROM s)
              SELECT event_type AS entry_type,
                CAST(COUNT(*) AS BIGINT) AS n_sessions,
                CAST(SUM(converted) AS BIGINT) AS n_converted,
                CAST(SUM(converted) * 10000 // COUNT(*) AS BIGINT) AS conv_bp
              FROM marked WHERE rn = 1
              GROUP BY event_type ORDER BY event_type""")),

    // Native as-of join — the whole-operator Catalyst tier: a custom
    // LogicalPlan (graft.plans.AsOfJoin) planned by an injected
    // SparkStrategy into AsOfJoinExec, whose required distribution/
    // ordering buys one exchange + sort per side and a streaming
    // O(1)-state merge (see plans/AsOfJoinPlan.scala). Same semantics
    // as q54's window/union composition; the oracle is DuckDB's own
    // native ASOF LEFT JOIN.
    QueryDef("q210_asof_native",
      (s, d) => {
        val ev = table(s, d, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        graft.ops.AsOf.joinAsOf(p, c, Seq("user_id"), Seq("c_user"), "ts", "c_ts")
          .select(col("user_id"), col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
            date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_click_ts"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id, ts FROM events
                         WHERE event_type = 'purchase'),
                   c AS (SELECT user_id AS c_user, ts AS c_ts FROM events
                         WHERE event_type = 'click')
              SELECT p.user_id, p.event_id,
                STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
                STRFTIME(c.c_ts, '%Y-%m-%d %H:%M:%S') AS asof_click_ts
              FROM p ASOF LEFT JOIN c
                ON p.user_id = c.c_user AND p.ts >= c.c_ts
              ORDER BY p.user_id, p.event_id"""))
  )
}
