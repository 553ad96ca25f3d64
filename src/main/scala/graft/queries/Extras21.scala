package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import QueryDef.table

/** Round-7 depth batch: typed data skipping on the TxLog table and
  * lakehouse surface growth.
  */
object Extras21 {

  val all: Seq[QueryDef] = Seq(

    // Typed min/max data skipping: the TxLog commit log records
    // footer stats for DATE, TIMESTAMP and DECIMAL columns (the
    // partition-adjacent predicate types of a TPC-H-ish lake), and
    // prunedRead skips files whose range cannot intersect the bound.
    // Appends are range-clustered on the date so files carry tight
    // non-overlapping ranges — the layout any lake table needs before
    // skipping pays. The oracle is the plain filter over the same
    // rows, proving the pruned read is contents-exact on every typed
    // dimension (TxLogTableSpec asserts the actual file skipping).
    QueryDef("q227_txlog_typed_prune",
      (s, d) => {
        val t = QueryDef.scratch("graft_txt")
          .resolve("orders").toString
        val base = table(s, d, "orders").select(
          col("o_orderkey").as("k"),
          to_date(col("o_orderdate")).as("od"),
          col("o_orderdate").as("ots"),
          (expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)")
            .cast(DecimalType(16, 0)) / 100).cast(DecimalType(14, 2))
            .as("price"))
        for (i <- 0 until 3)
          graft.sink.TxLogTable.append(
            base.filter(pmod(col("k"), lit(3)) === i)
              .repartitionByRange(4, col("od")), t)
        def band(part: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(lit(part).as("part"), count(lit(1)).as("n_rows"),
            sum(col("price")).cast(DecimalType(20, 2)).as("turnover"),
            min(col("od")).as("min_od"), max(col("k")).as("max_k"))
        val dateBand = band("date_band", graft.sink.TxLogTable.prunedRead(
          s, t, "od",
          lower = Some(java.time.LocalDate.parse("1996-03-01")),
          upper = Some(java.time.LocalDate.parse("1996-08-31"))))
        val tsBand = band("ts_band", graft.sink.TxLogTable.prunedRead(
          s, t, "ots",
          lower = Some(java.time.LocalDateTime.parse("1997-01-01T00:00:00")),
          upper = Some(java.time.LocalDateTime.parse("1997-03-31T23:59:59"))))
        val decBand = band("dec_band", graft.sink.TxLogTable.prunedRead(
          s, t, "price",
          lower = Some(new java.math.BigDecimal("50000.00")),
          upper = Some(new java.math.BigDecimal("100000.00"))))
        dateBand.unionAll(tsBand).unionAll(decBand).orderBy("part")
      },
      Some("""WITH o AS (SELECT o_orderkey AS k,
                     CAST(o_orderdate AS DATE) AS od, o_orderdate AS ots,
                     CAST(CAST(CAST(floor(o_totalprice * 100.0) AS BIGINT)
                          AS DECIMAL(16,0)) / 100 AS DECIMAL(14,2)) AS price
                   FROM orders)
              SELECT 'date_band' AS part, COUNT(*) AS n_rows,
                     CAST(SUM(price) AS DECIMAL(20,2)) AS turnover,
                     MIN(od) AS min_od, MAX(k) AS max_k
              FROM o WHERE od BETWEEN DATE '1996-03-01' AND DATE '1996-08-31'
              UNION ALL
              SELECT 'ts_band', COUNT(*), CAST(SUM(price) AS DECIMAL(20,2)),
                     MIN(od), MAX(k)
              FROM o WHERE ots BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                                   AND TIMESTAMP '1997-03-31 23:59:59'
              UNION ALL
              SELECT 'dec_band', COUNT(*), CAST(SUM(price) AS DECIMAL(20,2)),
                     MIN(od), MAX(k)
              FROM o WHERE price BETWEEN 50000.00 AND 100000.00
              ORDER BY part"""))
  ,

    // The SQL-facing lake surface: the TxLog table read through
    // spark.read.format("graft-txlog") with versionAsOf time travel,
    // where the query's own WHERE drives committed-stats file skipping
    // inside the custom FileIndex (TxLogDataSourceSpec asserts the
    // numFiles metric). Version 2 appends the same rows again, so
    // reading latest instead of v1 would double every count — the
    // oracle catches any time-travel slip.
    QueryDef("q228_txlog_format_read",
      (s, d) => {
        val t = QueryDef.scratch("graft_txf")
          .resolve("orders").toString
        val base = table(s, d, "orders").select(
          col("o_orderkey").as("k"), col("o_totalprice").as("price"))
        val v1 = graft.sink.TxLogTable.append(
          base.repartitionByRange(4, col("k")), t)
        graft.sink.TxLogTable.append(base.repartitionByRange(4, col("k")), t)
        s.read.format("graft-txlog").option("versionAsOf", v1.toString)
          .load(t)
          .filter(col("k") >= 1000L && col("k") <= 20000L)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("price").cast(DecimalType(18, 4))).cast("double")
              .as("turnover"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                       AS turnover,
                     MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
              FROM orders WHERE o_orderkey BETWEEN 1000 AND 20000"""))
  ,

    // The lakehouse loop under the oracle gate: customer rows land in
    // a TxLog table across three commits, a Structured Streaming query
    // consumes them through the incremental source (offsets = versions,
    // one micro-batch per available range), aggregates per nation in
    // complete mode, and the settled memory-sink table is the result.
    // The oracle is the plain batch aggregate over the same rows —
    // exactly-once delivery through the stream IS the assertion (any
    // duplicated or dropped micro-batch changes the counts/sums).
    QueryDef("q229_txlog_stream_agg",
      (s, d) => {
        val t = QueryDef.scratch("graft_txs")
          .resolve("cust").toString
        val ckpt = QueryDef.scratch("graft_txs_ck").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"), col("c_nationkey").as("nation"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        for (i <- 0 until 3)
          graft.sink.TxLogTable.append(
            base.filter(pmod(col("k"), lit(3)) === i).repartition(2), t)
        val sink = s"txs_agg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val q = s.readStream.format("graft-txlog").load(t)
          .groupBy("nation")
          .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("bal_cents"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .start()
        try q.processAllAvailable() finally q.stop()
        s.table(sink).orderBy("nation")
      },
      Some("""SELECT c_nationkey AS nation, COUNT(*) AS n_cust,
                     CAST(SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT))
                          AS BIGINT) AS bal_cents
              FROM customer GROUP BY c_nationkey ORDER BY nation"""))
  ,

    // Change data feed off the commit log: an append, a MERGE (upsert
    // = copy-on-write overwrite), and another append produce a
    // row-level insert/delete feed per version — deletes carry the
    // pre-image, upsert inserts the post-image, untouched rows never
    // appear. The oracle reconstructs each version's delta from the
    // base table arithmetic, so the multiset diff (exceptAll) the
    // feed computes is hash-verified end to end.
    QueryDef("q230_txlog_changes",
      (s, d) => {
        val t = QueryDef.scratch("graft_txc")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"), col("c_nationkey").as("nation"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        graft.sink.TxLogTable.append(
          base.filter(pmod(col("k"), lit(3)) === 0).repartition(2), t) // v1
        val updates = base.filter(pmod(col("k"), lit(6)) === 0)
          .withColumn("bal_c", col("bal_c") + 1000L)
          .unionAll(base.filter(pmod(col("k"), lit(3)) === 1))
        graft.sink.TxLogTable.merge(s, t, updates, "k")                // v2
        graft.sink.TxLogTable.append(
          base.filter(pmod(col("k"), lit(3)) === 2).repartition(2), t) // v3
        graft.sink.TxLogTable.changes(s, t, 0L, 3L)
          .groupBy(col("_commit_version").as("version"),
            col("_change_type").as("change"))
          .agg(count(lit(1)).as("n_rows"), sum(col("bal_c")).as("bal_sum"))
          .orderBy("version", "change")
      },
      Some("""WITH c AS (SELECT c_custkey AS k,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal
                   FROM customer)
              SELECT CAST(1 AS BIGINT) AS version, 'insert' AS change,
                     COUNT(*) AS n_rows, CAST(SUM(bal) AS BIGINT) AS bal_sum
              FROM c WHERE k % 3 = 0
              UNION ALL
              SELECT 2, 'delete', COUNT(*), CAST(SUM(bal) AS BIGINT)
              FROM c WHERE k % 6 = 0
              UNION ALL
              SELECT 2, 'insert', COUNT(*),
                     CAST(SUM(bal + CASE WHEN k % 6 = 0 THEN 1000 ELSE 0 END)
                          AS BIGINT)
              FROM c WHERE k % 6 = 0 OR k % 3 = 1
              UNION ALL
              SELECT 3, 'insert', COUNT(*), CAST(SUM(bal) AS BIGINT)
              FROM c WHERE k % 3 = 2
              ORDER BY version, change"""))
  ,

    // Pure-SQL time travel: a temporary view over the TxLog format
    // pins versionAsOf in OPTIONS, and plain spark.sql against it
    // aggregates version 1 — version 2 appends the same rows again,
    // so any slip to "latest" doubles every count. This is the
    // no-library-API surface a SQL-only user gets.
    QueryDef("q231_txlog_sql_view",
      (s, d) => {
        val t = QueryDef.scratch("graft_txv")
          .resolve("orders").toString
        val base = table(s, d, "orders").select(
          col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
          col("o_totalprice").as("price"))
        val v1 = graft.sink.TxLogTable.append(
          base.repartitionByRange(4, col("k")), t)
        graft.sink.TxLogTable.append(base.repartitionByRange(4, col("k")), t)
        val view = s"txv_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        s.sql(s"""CREATE OR REPLACE TEMPORARY VIEW $view
                  USING `graft-txlog`
                  OPTIONS (path '$t', versionAsOf '$v1')""")
        s.sql(s"""SELECT prio, COUNT(*) AS n_orders,
                         CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE)
                           AS turnover
                  FROM $view WHERE k <= 10000
                  GROUP BY prio ORDER BY prio""")
      },
      Some("""SELECT o_orderpriority AS prio,
                     CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                       AS turnover
              FROM orders WHERE o_orderkey <= 10000
              GROUP BY o_orderpriority ORDER BY prio"""))
  ,

    // CDC through the format options: the same three-version feed as
    // q230 (append, MERGE upsert, append), read back with
    // changesFrom/changesTo instead of a library call — the surface a
    // downstream sync job would actually script against.
    QueryDef("q232_txlog_format_changes",
      (s, d) => {
        val t = QueryDef.scratch("graft_txfc")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"), col("c_nationkey").as("nation"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        graft.sink.TxLogTable.append(
          base.filter(pmod(col("k"), lit(3)) === 0).repartition(2), t) // v1
        val updates = base.filter(pmod(col("k"), lit(6)) === 0)
          .withColumn("bal_c", col("bal_c") + 1000L)
          .unionAll(base.filter(pmod(col("k"), lit(3)) === 1))
        graft.sink.TxLogTable.merge(s, t, updates, "k")                // v2
        graft.sink.TxLogTable.append(
          base.filter(pmod(col("k"), lit(3)) === 2).repartition(2), t) // v3
        // only the MERGE version's feed, bounded from both sides
        s.read.format("graft-txlog")
          .option("changesFrom", "1").option("changesTo", "2").load(t)
          .groupBy(col("_change_type").as("change"))
          .agg(count(lit(1)).as("n_rows"), sum(col("bal_c")).as("bal_sum"))
          .orderBy("change")
      },
      Some("""WITH c AS (SELECT c_custkey AS k,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal
                   FROM customer)
              SELECT 'delete' AS change, COUNT(*) AS n_rows,
                     CAST(SUM(bal) AS BIGINT) AS bal_sum
              FROM c WHERE k % 6 = 0
              UNION ALL
              SELECT 'insert', COUNT(*),
                     CAST(SUM(bal + CASE WHEN k % 6 = 0 THEN 1000 ELSE 0 END)
                          AS BIGINT)
              FROM c WHERE k % 6 = 0 OR k % 3 = 1
              ORDER BY change"""))
  )
}
