package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDef.table

/** Round-4 widening, batch 14: distribution diagnostics — activity
  * CCDF, inter-purchase gap histogram, dual-fence IQR outlier
  * screen, min-max feature scaling, and a near-dup source
  * contamination matrix.
  */
object Extras17 {

  val all: Seq[QueryDef] = Seq(

    // Complementary CDF of per-user activity: for each observed event
    // count, how many users have at least that many events (and the
    // share in bp). The CCDF windows run over the aggregated
    // count-of-counts frame — tiny by construction.
    QueryDef("q211_activity_ccdf",
      (s, d) => {
        val c = table(s, d, "events").groupBy("user_id")
          .agg(count(lit(1)).as("n_events"))
          .transform(graft.ops.Pinned.pin) // two consumers: totals + distribution
        val t = c.agg(count(lit(1)).as("n_users"))
        val dist = c.groupBy("n_events").agg(count(lit(1)).as("n_at"))
        val ge = Window.orderBy(col("n_events").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        dist.crossJoin(broadcast(t))
          .withColumn("users_ge", sum("n_at").over(ge))
          .withColumn("ge_bp", expr("users_ge * 10000 div n_users"))
          .select("n_events", "n_at", "users_ge", "ge_bp")
          .orderBy("n_events")
      },
      Some("""WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
                         FROM events GROUP BY user_id),
              t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM c),
              d AS (SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_at
                    FROM c GROUP BY n_events)
              SELECT n_events, n_at,
                CAST(SUM(n_at) OVER (ORDER BY n_events DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS users_ge,
                CAST(SUM(n_at) OVER (ORDER BY n_events DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  * 10000 // t.n_users AS BIGINT) AS ge_bp
              FROM d CROSS JOIN t
              ORDER BY n_events""")),

    // Inter-purchase gap histogram: whole-day gaps between a user's
    // consecutive purchase days, binned into labeled buckets with
    // shares in bp. The lag window partitions by user (high
    // cardinality); the histogram is a 5-row aggregate.
    QueryDef("q212_interpurchase_gaps",
      (s, d) => {
        val dd = table(s, d, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").cast(org.apache.spark.sql.types.DateType).as("day"))
          .distinct()
        val g = dd.withColumn("gap_d",
          datediff(col("day"), lag("day", 1).over(
            Window.partitionBy("user_id").orderBy("day"))))
          .filter(col("gap_d").isNotNull)
        val b = g.select(
          when(col("gap_d") <= 1, "0_1d")
            .when(col("gap_d") <= 3, "1_2_3d")
            .when(col("gap_d") <= 7, "2_4_7d")
            .when(col("gap_d") <= 14, "3_8_14d")
            .otherwise("4_15d_plus").as("bucket"))
          .transform(graft.ops.Pinned.pin) // total + per-bucket counts
        val t = b.agg(count(lit(1)).as("total"))
        b.groupBy("bucket").agg(count(lit(1)).as("n_gaps"))
          .crossJoin(broadcast(t))
          .withColumn("share_bp", expr("n_gaps * 10000 div total"))
          .select("bucket", "n_gaps", "share_bp")
          .orderBy("bucket")
      },
      Some("""WITH p AS (
                SELECT user_id, CAST(ts AS DATE) AS day
                FROM events WHERE event_type = 'purchase'),
              dd AS (SELECT DISTINCT user_id, day FROM p),
              g AS (
                SELECT user_id,
                  date_diff('day', lag(day) OVER (PARTITION BY user_id ORDER BY day),
                    day) AS gap_d
                FROM dd),
              b AS (
                SELECT CASE WHEN gap_d <= 1 THEN '0_1d' WHEN gap_d <= 3 THEN '1_2_3d'
                            WHEN gap_d <= 7 THEN '2_4_7d' WHEN gap_d <= 14 THEN '3_8_14d'
                            ELSE '4_15d_plus' END AS bucket
                FROM g WHERE gap_d IS NOT NULL)
              SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps,
                CAST(COUNT(*) * 10000 // (SELECT COUNT(*) FROM b) AS BIGINT)
                  AS share_bp
              FROM b GROUP BY bucket ORDER BY bucket""")),

    // IQR outlier screen with two fences: the standard Tukey 1.5×IQR
    // (n_low/n_high — legitimately zero on this uniform-ish data) and
    // a tight 0.5×IQR screen (n_low_t/n_high_t) that does fire.
    // Quartiles come from ONE histogram-refinement pass
    // (ops/Quantiles.groupRankValues — both rank lookups share the
    // bucket histogram; crossing-bucket re-scan only); fences are
    // integer cents (k·IQR = (3·IQR) div 2 and IQR div 2 — no float
    // math).
    QueryDef("q213_iqr_outliers",
      (s, d) => {
        import graft.ops.Quantiles.RankSpec
        val c = table(s, d, "orders")
          .select(col("o_orderpriority").as("pri"),
            expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("p_c"))
        val q = graft.ops.Quantiles.groupRankValues(c, "pri", col("p_c"), lit(1L),
            Seq(RankSpec("q1d", 1, 4, 3), RankSpec("q3d", 3, 4, 3)))
          .select(col("pri"), col("q1d").cast("long").as("q1_c"), // exact: integer cents
            col("q3d").cast("long").as("q3_c"))
        c.join(broadcast(q), "pri")
          .groupBy("pri", "q1_c", "q3_c")
          .agg(
            sum(when(expr("p_c < q1_c - (3 * (q3_c - q1_c)) div 2"), 1L).otherwise(0L)).as("n_low"),
            sum(when(expr("p_c > q3_c + (3 * (q3_c - q1_c)) div 2"), 1L).otherwise(0L)).as("n_high"),
            sum(when(expr("p_c < q1_c - (q3_c - q1_c) div 2"), 1L).otherwise(0L)).as("n_low_t"),
            sum(when(expr("p_c > q3_c + (q3_c - q1_c) div 2"), 1L).otherwise(0L)).as("n_high_t"),
            count(lit(1)).as("n"))
          .orderBy("pri")
      },
      Some("""WITH c AS (
                SELECT o_orderpriority AS pri,
                  CAST(floor(o_totalprice * 100.0) AS BIGINT) AS p_c
                FROM orders),
              r AS (
                SELECT pri, p_c,
                  row_number() OVER (PARTITION BY pri ORDER BY p_c) AS rn,
                  COUNT(*) OVER (PARTITION BY pri) AS n
                FROM c),
              q AS (
                SELECT pri,
                  MAX(CASE WHEN rn = (n + 3) // 4 THEN p_c END) AS q1_c,
                  MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN p_c END) AS q3_c
                FROM r GROUP BY pri)
              SELECT c.pri, q.q1_c, q.q3_c,
                CAST(COUNT(CASE WHEN c.p_c < q.q1_c - (3 * (q.q3_c - q.q1_c)) // 2
                  THEN 1 END) AS BIGINT) AS n_low,
                CAST(COUNT(CASE WHEN c.p_c > q.q3_c + (3 * (q.q3_c - q.q1_c)) // 2
                  THEN 1 END) AS BIGINT) AS n_high,
                CAST(COUNT(CASE WHEN c.p_c < q.q1_c - (q.q3_c - q.q1_c) // 2
                  THEN 1 END) AS BIGINT) AS n_low_t,
                CAST(COUNT(CASE WHEN c.p_c > q.q3_c + (q.q3_c - q.q1_c) // 2
                  THEN 1 END) AS BIGINT) AS n_high_t,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM c JOIN q ON c.pri = q.pri
              GROUP BY c.pri, q.q1_c, q.q3_c ORDER BY c.pri""")),

    // Per-dimension min-max scaling (feature normalization before
    // index build / model prep), emitted for a probe slice. The
    // scaled value is (x−lo)/(hi−lo): two subtractions and one
    // division, each a single correctly-rounded IEEE op — portable
    // without any rounding tricks. Per-dim stats aggregate in one
    // shuffle; the probe join is a broadcast of ≤ dims rows.
    QueryDef("q214_minmax_scaled_dims",
      (s, d) => {
        val x = table(s, d, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
          .filter(col("dim") < 4)
          .select(col("vec_id"), col("dim").cast(org.apache.spark.sql.types.LongType).as("dim"),
            col("v").cast(org.apache.spark.sql.types.DoubleType).as("v"))
        val mm = x.groupBy("dim").agg(min("v").as("lo"), max("v").as("hi"))
        x.filter(col("vec_id") < 50)
          .join(broadcast(mm), "dim")
          .select(col("vec_id"), col("dim"),
            ((col("v") - col("lo")) / (col("hi") - col("lo"))).as("scaled"))
          .orderBy("vec_id", "dim")
      },
      Some("""WITH x AS (
                SELECT vec_id, CAST(dim - 1 AS BIGINT) AS dim, CAST(v AS DOUBLE) AS v
                FROM (SELECT vec_id, unnest(embedding) AS v,
                        generate_subscripts(embedding, 1) AS dim FROM embeddings)
                WHERE dim - 1 < 4),
              mm AS (SELECT dim, MIN(v) AS lo, MAX(v) AS hi FROM x GROUP BY dim)
              SELECT x.vec_id, x.dim, (x.v - mm.lo) / (mm.hi - mm.lo) AS scaled
              FROM x JOIN mm ON x.dim = mm.dim
              WHERE x.vec_id < 50
              ORDER BY x.vec_id, x.dim""")),

    // Near-dup contamination matrix: SNM candidate pairs (q206's
    // blocked pass) rolled up by unordered source pair — the corpus
    // QA view that tells you which sources are copying which before
    // training. Map-side after the blocked window; the matrix is
    // |sources|² at most.
    QueryDef("q215_neardup_source_matrix",
      (s, d) => {
        val k = table(s, d, "documents").select(col("doc_id"), col("source"),
          substring(col("text"), 1, 4).as("blk"),
          substring(col("text"), 1, 40).as("key"),
          substring(col("text"), 1, 30).as("probe"))
        val w = Window.partitionBy("blk").orderBy(col("key"), col("doc_id"))
        val pairs = k
          .withColumn("n1", lead(col("doc_id"), 1).over(w))
          .withColumn("s1", lead(col("source"), 1).over(w))
          .withColumn("p1", lead(col("probe"), 1).over(w))
          .filter(col("n1").isNotNull &&
            levenshtein(col("probe"), col("p1")) <= 6)
        pairs
          .groupBy(least(col("source"), col("s1")).as("source_lo"),
            greatest(col("source"), col("s1")).as("source_hi"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("n_pairs").desc, col("source_lo"), col("source_hi"))
      },
      Some("""WITH k AS (
                SELECT doc_id, source, substring(text, 1, 4) AS blk,
                  substring(text, 1, 40) AS key, substring(text, 1, 30) AS probe
                FROM documents),
              w AS (
                SELECT doc_id, source, probe,
                  lead(doc_id, 1) OVER (PARTITION BY blk ORDER BY key, doc_id) AS n1,
                  lead(source, 1) OVER (PARTITION BY blk ORDER BY key, doc_id) AS s1,
                  lead(probe, 1)  OVER (PARTITION BY blk ORDER BY key, doc_id) AS p1
                FROM k),
              pairs AS (
                SELECT source AS src_a, s1 AS src_b FROM w
                WHERE n1 IS NOT NULL AND levenshtein(probe, p1) <= 6)
              SELECT LEAST(src_a, src_b) AS source_lo,
                GREATEST(src_a, src_b) AS source_hi,
                CAST(COUNT(*) AS BIGINT) AS n_pairs
              FROM pairs GROUP BY source_lo, source_hi
              ORDER BY n_pairs DESC, source_lo, source_hi"""))
  )
}
