package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table

/** Round-6 depth batch 2: the banded range-join rewrite on real data.
  */
object Extras20 {

  val all: Seq[QueryDef] = Seq(

    // Pure range join — NO equi-key: every view within 5 minutes
    // after ANY click, across all users (global attribution window).
    // Written as the naive theta join, then rewritten by
    // plans.BandedRangeJoin (via ops.RangeJoin.banded) into an
    // equi-join on 5-minute bands: clicks explode onto the ≤2 bands
    // their window overlaps, views compute one band, candidates meet
    // on the band id, and the exact (v_ts > c_ts AND v_ts <= c_hi)
    // predicate runs as the residual. Without the rewrite Spark plans
    // a nested-loop join — quadratic per partition, a non-starter for
    // a month of events at 100 TB; with it the work shuffles on
    // ~8.6k distinct bands/month and AQE can split any hot band.
    // Output is the distribution of follow-up counts (clicks with ≥1
    // view in window, grouped by how many), bounded and portable.
    QueryDef("q222_banded_range_join",
      (s, d) => {
        val ev = table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("ts").as("c_ts"),
            (col("ts") + expr("INTERVAL '5' MINUTE")).as("c_hi"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("ts").as("v_ts"))
        val naive = clicks.join(views,
          col("v_ts") > col("c_ts") && col("v_ts") <= col("c_hi"))
        graft.ops.RangeJoin.banded(naive, binSize = 300L * 1000 * 1000)
          .groupBy("click_id")
          .agg(count(lit(1)).as("n_views"))
          .groupBy("n_views")
          .agg(count(lit(1)).as("n_clicks"))
          .orderBy("n_views")
      },
      Some("""WITH c AS (SELECT event_id AS click_id, ts AS c_ts
                         FROM events WHERE event_type = 'click'),
                   v AS (SELECT ts AS v_ts FROM events WHERE event_type = 'view'),
                   per AS (SELECT c.click_id, COUNT(*) AS n_views
                           FROM c JOIN v
                             ON v.v_ts > c.c_ts
                            AND v.v_ts <= c.c_ts + INTERVAL '5 minutes'
                           GROUP BY c.click_id)
              SELECT n_views, COUNT(*) AS n_clicks
              FROM per GROUP BY n_views ORDER BY n_views""")),

    // Version-log ACID table end-to-end (sink/TxLogTable): three
    // commits — append thirds-0, overwrite with thirds-1, append
    // thirds-2 — then TIME-TRAVEL reads of versions 1..3, each
    // fingerprinted (count, cents sum, key range). The oracle
    // recomputes every snapshot straight from `customer`, so the
    // query proves the log replay (overwrite resets, append extends)
    // and snapshot isolation cross-engine, not just in the spec.
    // Writes go through the normal distributed parquet writer; the
    // commit is one driver-side metadata file.
    QueryDef("q223_txlog_time_travel",
      (s, d) => {
        val t = QueryDef.scratch("graft_txlog")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        graft.sink.TxLogTable.append(base.filter(col("k") % 3 === 0), t)
        graft.sink.TxLogTable.overwrite(base.filter(col("k") % 3 === 1), t)
        graft.sink.TxLogTable.append(base.filter(col("k") % 3 === 2), t)
        (1L to 3L).map { v =>
          graft.sink.TxLogTable.read(s, t, Some(v))
            .groupBy(lit(v).as("version"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("bal_c")).as("bal_cents"),
              min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        }.reduce(_.unionAll(_)).orderBy("version")
      },
      Some("""WITH b AS (SELECT c_custkey AS k,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c
                   FROM customer),
                   v1 AS (SELECT * FROM b WHERE k % 3 = 0),
                   v2 AS (SELECT * FROM b WHERE k % 3 = 1),
                   v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM b WHERE k % 3 = 2)
              SELECT 1 AS version, COUNT(*) AS n_rows,
                     CAST(SUM(bal_c) AS BIGINT) AS bal_cents,
                     MIN(k) AS min_k, MAX(k) AS max_k FROM v1
              UNION ALL
              SELECT 2, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM v2
              UNION ALL
              SELECT 3, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM v3
              ORDER BY version""")),

    // Data-skipping read over the version-log table: one append
    // range-clustered on the key (repartitionByRange → each parquet
    // file holds a contiguous key band; the commit records each
    // file's footer min/max), then prunedRead(k in [lo, hi]) plans
    // its scan over ONLY the files whose recorded range intersects —
    // at 100 TB a selective read touches a handful of files instead
    // of the table. Equality with a plain filtered read is the
    // correctness contract (conservative pruning + residual filter);
    // TxLogTableSpec additionally asserts files really are skipped.
    QueryDef("q224_txlog_pruned_read",
      (s, d) => {
        val t = QueryDef.scratch("graft_txprune")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        graft.sink.TxLogTable.append(base.repartitionByRange(8, col("k")), t)
        graft.sink.TxLogTable
          .prunedRead(s, t, "k", lower = Some(100L), upper = Some(600L))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("bal_c")).as("bal_cents"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
                     CAST(SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS bal_cents,
                     MIN(c_custkey) AS min_k, MAX(c_custkey) AS max_k
              FROM customer
              WHERE c_custkey BETWEEN 100 AND 600""")),

    // Compaction end-to-end: three unclustered appends (each split
    // into 4 files, every file spanning the whole key range — the
    // small-file tail a micro-batch sink leaves), then
    // compact(clusterBy = k) bin-packs them into range-clustered
    // files as ONE new version, and the final fingerprint is read
    // through a prunedRead band over the compacted layout. Proves
    // cross-engine that the rewrite is contents-identical AND that
    // pre-compaction versions still replay (v1 fingerprint), while
    // TxLogTableSpec asserts the file-count/skipping mechanics.
    QueryDef("q225_txlog_compact",
      (s, d) => {
        val t = QueryDef.scratch("graft_txcompact")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        for (i <- 0 until 3)
          graft.sink.TxLogTable.append(
            base.filter(pmod(col("k"), lit(3)) === i).repartition(4), t)
        graft.sink.TxLogTable.compact(s, t, clusterBy = Some("k"))
        val v1 = graft.sink.TxLogTable.read(s, t, asOfVersion = Some(1L))
          .agg(lit("v1_precompact").as("part"), count(lit(1)).as("n_rows"),
            sum(col("bal_c")).as("bal_cents"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        val band = graft.sink.TxLogTable
          .prunedRead(s, t, "k", lower = Some(100L), upper = Some(600L))
          .agg(lit("compacted_band").as("part"), count(lit(1)).as("n_rows"),
            sum(col("bal_c")).as("bal_cents"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        v1.unionAll(band).orderBy("part")
      },
      Some("""WITH c AS (SELECT c_custkey AS k,
                                CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c
                         FROM customer)
              SELECT 'compacted_band' AS part, COUNT(*) AS n_rows,
                     CAST(SUM(bal_c) AS BIGINT) AS bal_cents,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM c WHERE k BETWEEN 100 AND 600
              UNION ALL
              SELECT 'v1_precompact', COUNT(*), CAST(SUM(bal_c) AS BIGINT),
                     MIN(k), MAX(k)
              FROM c WHERE k % 3 = 0
              ORDER BY part"""))
  ) ++ Seq(

    // Z-order maintenance end-to-end: shuffled appends (every file
    // spans the full range of both k and n), then compact(zOrderBy =
    // (k, n)) lays the rewrite along the Morton curve, and BOTH
    // dimension bands are read back through prunedRead over the
    // curve-clustered files. The oracle is the plain filter — proving
    // the layout op is contents-exact on either probe dimension
    // (TxLogTableSpec asserts the actual file skipping).
    QueryDef("q226_txlog_zorder",
      (s, d) => {
        val t = QueryDef.scratch("graft_txz")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"), col("c_nationkey").as("n"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        for (i <- 0 until 3)
          graft.sink.TxLogTable.append(
            base.filter(pmod(col("k"), lit(3)) === i).repartition(4), t)
        graft.sink.TxLogTable.compact(s, t, targetFileBytes = 16L * 1024,
          zOrderBy = Some(("k", "n")))
        def band(part: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(lit(part).as("part"), count(lit(1)).as("n_rows"),
            sum(col("bal_c")).as("bal_cents"),
            min(col("k")).as("min_k"), max(col("n")).as("max_n"))
        band("k_band", graft.sink.TxLogTable
            .prunedRead(s, t, "k", lower = Some(100L), upper = Some(600L)))
          .unionAll(band("n_band", graft.sink.TxLogTable
            .prunedRead(s, t, "n", lower = Some(5L), upper = Some(10L))))
          .orderBy("part")
      },
      Some("""WITH c AS (SELECT c_custkey AS k, c_nationkey AS n,
                                CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c
                         FROM customer)
              SELECT 'k_band' AS part, COUNT(*) AS n_rows,
                     CAST(SUM(bal_c) AS BIGINT) AS bal_cents,
                     MIN(k) AS min_k, MAX(n) AS max_n
              FROM c WHERE k BETWEEN 100 AND 600
              UNION ALL
              SELECT 'n_band', COUNT(*), CAST(SUM(bal_c) AS BIGINT),
                     MIN(k), MAX(n)
              FROM c WHERE n BETWEEN 5 AND 10
              ORDER BY part"""))
  )
}
