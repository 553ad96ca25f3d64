package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Ranks
import QueryDef.table

/** Round-4 widening, batch 7: parametric outlier screening, time-grid
  * densification, period-over-period deltas, and fixed-N stratified
  * sampling.
  *
  * Determinism: moments accumulate as exact BIGINTs over integer-
  * scaled values (cents); z-scores use sqrt, which IEEE-754 requires
  * correctly rounded (unlike log/exp — portable); time buckets are
  * epoch-integer division; deltas are integer lags; the sample is
  * md5-rank ordered.
  */
object Extras10 {

  val all: Seq[QueryDef] = Seq(

    // parametric outlier screen: per event_type mean/std of the value
    // (cent-scaled BIGINT moments: n * max_cents^2 stays inside int64
    // through sf ~1000; beyond that the first combine would switch to
    // a two-level decimal agg), then one more pass counting |z| >= 1.5
    // rows and the extreme z values. Complements the robust
    // median/MAD screen (q131) with the z-score variant; two passes,
    // both one shuffle on the 5-value type key after map-side combine.
    QueryDef("q168_group_zscore",
      (s, d) => {
        val e = table(s, d, "events")
          .select(col("event_type"),
            expr("CAST(floor(value * 100.0) AS BIGINT)").as("c"))
        val m = e.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("c").as("sc"),
          sum(col("c") * col("c")).as("scc"))
          .withColumn("mean_c", col("sc").cast(DoubleType) / col("n").cast(DoubleType))
          .withColumn("std_c", sqrt(
            (col("scc").cast(DoubleType) -
              col("sc").cast(DoubleType) * col("sc").cast(DoubleType) /
                col("n").cast(DoubleType)) /
              (col("n") - 1).cast(DoubleType)))
        e.join(broadcast(m), "event_type")
          .withColumn("z", (col("c").cast(DoubleType) - col("mean_c")) / col("std_c"))
          .groupBy("event_type")
          .agg(max("n").as("n"), max("mean_c").as("mean_c"), max("std_c").as("std_c"),
            count(when(abs(col("z")) >= 1.5, 1)).as("n_out"),
            min("z").as("z_min"), max("z").as("z_max"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (
                SELECT event_type, CAST(floor(value * 100.0) AS BIGINT) AS c
                FROM events),
              m AS (
                SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(c) AS BIGINT) AS sc,
                  CAST(SUM(c * c) AS BIGINT) AS scc
                FROM e GROUP BY event_type),
              ms AS (
                SELECT event_type, n,
                  CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
                  sqrt((CAST(scc AS DOUBLE) -
                        CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) /
                       CAST(n - 1 AS DOUBLE)) AS std_c
                FROM m),
              z AS (
                SELECT e.event_type, ms.n, ms.mean_c, ms.std_c,
                  (CAST(e.c AS DOUBLE) - ms.mean_c) / ms.std_c AS z
                FROM e JOIN ms ON e.event_type = ms.event_type)
              SELECT event_type, MAX(n) AS n, MAX(mean_c) AS mean_c,
                MAX(std_c) AS std_c,
                COUNT(CASE WHEN ABS(z) >= 1.5 THEN 1 END) AS n_out,
                MIN(z) AS z_min, MAX(z) AS z_max
              FROM z GROUP BY event_type ORDER BY event_type""")),

    // time-grid densification: hourly counts per event_type WITH
    // explicit zero rows for silent hours — the gap-filling step every
    // dashboard and anomaly detector needs before differencing. The
    // hour grid spans the table's observed range (a two-row global
    // aggregate broadcast into a generator — never a row-count-sized
    // driver collect); buckets are epoch-hour integers.
    QueryDef("q169_hour_fill",
      (s, d) => {
        val e = table(s, d, "events")
          .select(col("event_type"),
            col("ts").cast(TimestampType).cast(LongType).as("sec"))
          .select(col("event_type"), expr("sec div 3600").as("hour"))
        val counts = e.groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
        val span = e.agg(min("hour").as("h0"), max("hour").as("h1"))
        val hours = span.select(explode(sequence(col("h0"), col("h1"))).as("hour"))
        val types = e.select("event_type").distinct()
        hours.crossJoin(broadcast(types))
          .join(counts, Seq("event_type", "hour"), "left")
          .na.fill(0L, Seq("n"))
          .select(col("hour"), col("event_type"), col("n"))
          .orderBy("hour", "event_type")
      },
      Some("""WITH e AS (
                SELECT event_type,
                  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) // 3600 AS hour
                FROM events),
              counts AS (
                SELECT event_type, hour, COUNT(*) AS n FROM e GROUP BY event_type, hour),
              span AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM e),
              hours AS (
                SELECT unnest(range(h0, h1 + 1)) AS hour FROM span),
              grid AS (
                SELECT h.hour, t.event_type
                FROM hours h CROSS JOIN (SELECT DISTINCT event_type FROM e) t)
              SELECT g.hour, g.event_type,
                CAST(COALESCE(c.n, 0) AS BIGINT) AS n
              FROM grid g LEFT JOIN counts c
                ON c.event_type = g.event_type AND c.hour = g.hour
              ORDER BY g.hour, g.event_type""")),

    // week-over-week deltas: weekly event counts and cent-exact
    // revenue per type, with lagged absolute and relative changes —
    // the period-over-period report. Weeks are epoch-week integers;
    // the lag window partitions by type and walks a handful of weekly
    // rows; relative change guards the zero-base week with NULL.
    QueryDef("q170_wow_change",
      (s, d) => {
        val wk = table(s, d, "events")
          .select(col("event_type"),
            col("ts").cast(TimestampType).cast(LongType).as("sec"),
            expr("CAST(floor(value * 100.0) AS BIGINT)").as("c"))
          .select(col("event_type"), expr("sec div 604800").as("week"), col("c"))
          .groupBy("event_type", "week")
          .agg(count(lit(1)).as("n"), sum("c").as("rev_c"))
        val w = Window.partitionBy("event_type").orderBy("week")
        wk.withColumn("prev_n", lag("n", 1).over(w))
          .withColumn("delta_n", col("n") - col("prev_n"))
          .withColumn("pct_n",
            when(col("prev_n") > 0,
              col("delta_n").cast(DoubleType) / col("prev_n").cast(DoubleType)))
          .withColumn("delta_rev_c", col("rev_c") - lag("rev_c", 1).over(w))
          .select("event_type", "week", "n", "rev_c",
            "prev_n", "delta_n", "pct_n", "delta_rev_c")
          .orderBy("event_type", "week")
      },
      Some("""WITH wk AS (
                SELECT event_type,
                  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) // 604800 AS week,
                  COUNT(*) AS n,
                  CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS rev_c
                FROM events GROUP BY event_type, week),
              lg AS (
                SELECT event_type, week, CAST(n AS BIGINT) AS n, rev_c,
                  LAG(n, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
                  LAG(rev_c, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev_rev
                FROM wk)
              SELECT event_type, week, n, rev_c,
                CAST(prev_n AS BIGINT) AS prev_n,
                CAST(n - prev_n AS BIGINT) AS delta_n,
                CASE WHEN prev_n > 0
                  THEN CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE) END AS pct_n,
                CAST(rev_c - prev_rev AS BIGINT) AS delta_rev_c
              FROM lg ORDER BY event_type, week""")),

    // fixed-N stratified sample: exactly 10 documents per source in
    // md5(doc_id) order — the bounded, reproducible per-class subset
    // an eval-set builder draws (vs q76's fraction-based stratified
    // sample). Rank via the de-skewed range pass (Ranks), so no
    // low-cardinality window bottleneck at corpus scale.
    QueryDef("q171_fixed_n_sample",
      (s, d) => {
        val keyed = table(s, d, "documents")
          .select(col("source"), col("doc_id"),
            md5(col("doc_id").cast(StringType)).as("hx"))
        Ranks.groupRanked(keyed, "source", "hx")
          .filter(col("rn") <= 10)
          .select(col("source"), col("doc_id"), col("rn"))
          .orderBy("source", "rn")
      },
      Some("""WITH keyed AS (
                SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx
                FROM documents),
              r AS (
                SELECT source, doc_id,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY hx) AS rn
                FROM keyed)
              SELECT source, doc_id, CAST(rn AS BIGINT) AS rn
              FROM r WHERE rn <= 10 ORDER BY source, rn""")))
}
