package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Round-6 depth batch: multi-version CDC compaction and the inner
  * variant of the native as-of join.
  */
object Extras19 {

  val all: Seq[QueryDef] = Seq(

    // Multi-version CDC fold + apply (ops/Merge.applyChangeLog): a
    // change log carrying SEVERAL versions per key — upserts at seq 1
    // and 2, inserts at seq 2, deletes at seq 3 — collapses to the
    // highest-seq change per key in ONE map-side-combining
    // `max(struct(seq, ...))` aggregation (millions of versions of a
    // hot key shrink before the shuffle — the CDC-compaction plan),
    // then applies as anti-join delete + upsert union. Equivalence
    // with applying the versions one batch at a time in seq order is
    // property-spec'd in MergeSpec; this query proves the fold
    // cross-engine on a fingerprint of the applied table (all-integer:
    // cents balances, md5-prefix key checksum emitted as STRING per
    // the wide-decimal determinism rule).
    QueryDef("q220_cdc_multiversion",
      (s, d) => {
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        val log = base.filter(col("k") % 3 === 0)
          .select(col("k"), lit(1L).as("seq"), lit("U").as("op"),
            (col("bal_c") + 1000L).as("bal_c"))
          .unionAll(base.filter(col("k") % 6 === 0)
            .select(col("k"), lit(2L).as("seq"), lit("U").as("op"),
              (col("bal_c") + 2000L).as("bal_c")))
          .unionAll(base.filter(col("k") % 100 === 0)
            .select((col("k") + 3000000L).as("k"), lit(2L).as("seq"),
              lit("U").as("op"), col("bal_c")))
          .unionAll(base.filter(col("k") % 9 === 0)
            .select(col("k"), lit(3L).as("seq"), lit("D").as("op"),
              lit(null).cast(LongType).as("bal_c")))
        val applied = graft.ops.Merge.applyChangeLog(
          base, log, "k", "seq", "op")
        applied.agg(
          count(lit(1)).as("n_rows"),
          sum(conv(substring(md5(col("k").cast(StringType)), 1, 12), 16, 10)
            .cast(DecimalType(38, 0))).cast(StringType).as("keysum"),
          sum(col("bal_c")).as("balsum_c"))
      },
      Some("""WITH base AS (
                SELECT c_custkey AS k,
                       CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c
                FROM customer),
              chglog AS (
                SELECT k, 1 AS seq, 'U' AS op, bal_c + 1000 AS bal_c
                FROM base WHERE k % 3 = 0
                UNION ALL
                SELECT k, 2, 'U', bal_c + 2000 FROM base WHERE k % 6 = 0
                UNION ALL
                SELECT k + 3000000, 2, 'U', bal_c FROM base WHERE k % 100 = 0
                UNION ALL
                SELECT k, 3, 'D', NULL FROM base WHERE k % 9 = 0),
              folded AS (
                SELECT k, op, bal_c FROM (
                  SELECT k, op, bal_c,
                         ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
                  FROM chglog) t
                WHERE rn = 1),
              applied AS (
                SELECT b.k, b.bal_c FROM base b
                WHERE NOT EXISTS (SELECT 1 FROM folded f WHERE f.k = b.k)
                UNION ALL
                SELECT k, bal_c FROM folded WHERE op = 'U')
              SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(CAST(SUM(CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 12)
                       AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS keysum,
                     CAST(SUM(bal_c) AS BIGINT) AS balsum_c
              FROM applied""")),

    // INNER as-of through the native Catalyst node (q210's left-outer
    // sibling): purchases that HAVE a preceding click keep it,
    // click-less purchases vanish — the trades×quotes shape, and what
    // DuckDB's bare ASOF JOIN means by default. The exec's inner path
    // skips null padding via a look-ahead merge (one row copy per
    // EMITTED row); distribution/ordering and the pushdown rule are
    // shared with the left-outer form.
    QueryDef("q221_asof_inner",
      (s, d) => {
        val ev = QueryDef.table(s, d, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        graft.ops.AsOf.joinAsOf(p, c, Seq("user_id"), Seq("c_user"),
            "ts", "c_ts", joinType = "inner")
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
              FROM p ASOF JOIN c
                ON p.user_id = c.c_user AND p.ts >= c.c_ts
              ORDER BY p.user_id, p.event_id"""))
  )
}
