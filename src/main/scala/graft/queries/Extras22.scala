package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table

/** Round-7 depth batch 2: row-level DML on the TxLog table and the
  * co-location / pruning surface (bucketed joins, dynamic partition
  * pruning, incremental view maintenance).
  */
object Extras22 {

  val all: Seq[QueryDef] = Seq(

    // Row-level DELETE + UPDATE on the ACID table, cross-engine: v1
    // appends the customer projection, v2 deletes one segment, v3
    // bumps every tenth key's balance — both copy-on-write rewrites
    // that touch only files containing matches (TxLogTableSpec proves
    // the untouched-file guarantee; at 100 TB a selective delete
    // moves data proportional to the matching files, not the table).
    // The output fingerprints every snapshot (time travel through
    // the DML history) AND the change feed the two rewrites emit
    // (delete rows for v2; delete(old)+insert(new) pairs for v3),
    // all recomputed by the oracle straight from `customer`.
    QueryDef("q233_txlog_delete_update",
      (s, d) => {
        val t = QueryDef.scratch("graft_txdml")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"),
          col("c_mktsegment").as("seg"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        graft.sink.TxLogTable.append(base.repartition(4), t) // v1
        val v2 = graft.sink.TxLogTable.delete(s, t, "seg = 'BUILDING'")
        val v3 = graft.sink.TxLogTable.update(s, t, "k % 10 = 0",
          Map("bal_c" -> "bal_c + 7"))
        val snaps = Seq(1L, v2, v3).map { v =>
          graft.sink.TxLogTable.read(s, t, Some(v))
            .groupBy(lit(v).as("version"))
            .agg(count(lit(1)).as("n_rows"), sum(col("bal_c")).as("bal_cents"),
              min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        }.reduce(_.unionAll(_))
        val feed = graft.sink.TxLogTable.changes(s, t, 1L, v3)
          .groupBy((col("_commit_version") * 10 +
            when(col("_change_type") === "insert", 1).otherwise(2))
            .as("version"))
          .agg(count(lit(1)).as("n_rows"), sum(col("bal_c")).as("bal_cents"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        snaps.unionAll(feed).orderBy("version")
      },
      Some("""WITH b AS (SELECT c_custkey AS k, c_mktsegment AS seg,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c
                   FROM customer),
                   v2 AS (SELECT * FROM b WHERE seg <> 'BUILDING'),
                   v3 AS (SELECT k, seg,
                            bal_c + CASE WHEN k % 10 = 0 THEN 7 ELSE 0 END AS bal_c
                          FROM v2),
                   upd AS (SELECT * FROM v2 WHERE k % 10 = 0)
              SELECT 1 AS version, COUNT(*) AS n_rows,
                     CAST(SUM(bal_c) AS BIGINT) AS bal_cents,
                     MIN(k) AS min_k, MAX(k) AS max_k FROM b
              UNION ALL
              SELECT 2, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM v2
              UNION ALL
              SELECT 3, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM v3
              UNION ALL
              SELECT 22, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k)
              FROM b WHERE seg = 'BUILDING'
              UNION ALL
              SELECT 31, COUNT(*), CAST(SUM(bal_c + 7) AS BIGINT), MIN(k), MAX(k) FROM upd
              UNION ALL
              SELECT 32, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM upd
              ORDER BY version""")),

    // Bucketed co-located join: both sides written with
    // bucketBy(8, custkey) + sortBy into catalog-backed parquet
    // tables, then sort-merge-joined. Bucketing pre-shuffles the data
    // ONCE at write time; every subsequent join/aggregation on the
    // bucket key reads co-located buckets and plans NO Exchange on
    // either side (BucketedJoinSpec pins that plan shape, with
    // broadcast disabled so the shuffle-free claim is real). At
    // 100 TB this converts the recurring fact-to-fact shuffle — the
    // single most expensive stage of a repeated pipeline — into a
    // one-time layout cost, the same contract as Hive/Iceberg bucket
    // transforms. The merge hint keeps the exercised path SMJ even
    // where broadcast would win at test scale.
    QueryDef("q234_bucketed_join",
      (s, d) => {
        val wh = QueryDef.scratch("graft_bucket").toString
        s.sql("DROP TABLE IF EXISTS graft_b_orders")
        s.sql("DROP TABLE IF EXISTS graft_b_customer")
        table(s, d, "orders").select(col("o_custkey"),
            expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("price_c"))
          .write.format("parquet").bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$wh/orders").saveAsTable("graft_b_orders")
        table(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
          .write.format("parquet").bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$wh/cust").saveAsTable("graft_b_customer")
        s.table("graft_b_orders").hint("merge")
          .join(s.table("graft_b_customer").hint("merge"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"), sum(col("price_c")).as("rev_cents"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
                     COUNT(*) AS n_orders,
                     CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
                       AS rev_cents
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Incremental materialized-view maintenance off the change feed:
    // a per-customer (order count, spend) view is initialized at v1,
    // then v2 DELETEs a slice and v3 UPDATEs prices — and the view is
    // brought current by folding ONLY the change rows into the state
    // (ops/Matview: per-key pre-aggregated delta, full-outer merge).
    // No unchanged row is ever re-read: at 100 TB the view follows
    // the table at O(changes) per commit instead of O(table) per
    // refresh. The oracle recomputes the final view from scratch, so
    // the hash proves maintained == recomputed exactly.
    QueryDef("q235_matview_incremental",
      (s, d) => {
        val t = QueryDef.scratch("graft_mv")
          .resolve("ord").toString
        val base = table(s, d, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("cust"),
          col("o_orderstatus").as("status"),
          expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("price_c"))
        graft.sink.TxLogTable.append(base.repartition(4), t) // v1
        val sums = Map("spend_c" -> "price_c")
        val keys = Seq("cust")
        val state0 = graft.ops.Matview.initialize(
          graft.sink.TxLogTable.read(s, t, Some(1L)), keys, sums)
        val v2 = graft.sink.TxLogTable.delete(s, t, "status = 'F' AND k % 7 = 0")
        val v3 = graft.sink.TxLogTable.update(s, t, "k % 5 = 0",
          Map("price_c" -> "price_c + 100"))
        val feed = graft.sink.TxLogTable.changes(s, t, 1L, v3)
        graft.ops.Matview.applyDelta(state0, feed, keys, sums)
          .orderBy("cust")
      },
      Some("""WITH b AS (SELECT o_orderkey AS k, o_custkey AS cust,
                     o_orderstatus AS status,
                     CAST(floor(o_totalprice * 100.0) AS BIGINT) AS price_c
                   FROM orders),
                   kept AS (SELECT * FROM b
                            WHERE NOT (status = 'F' AND k % 7 = 0)),
                   fin AS (SELECT cust,
                             price_c + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END
                               AS price_c
                           FROM kept)
              SELECT cust, COUNT(*) AS n,
                     CAST(SUM(price_c) AS BIGINT) AS spend_c
              FROM fin GROUP BY cust ORDER BY cust""")),

    // Dynamic partition pruning: lineitem written partitioned by ship
    // year (hive-style directory layout), then joined to a tiny dim
    // whose filter selects two years. Catalyst plans a DPP subquery —
    // the dim's broadcast result prunes fact PARTITION DIRECTORIES at
    // runtime, before any parquet footer is opened (DppSpec pins the
    // `dynamicpruning` subquery and the pruned partition count). This
    // is THE mechanism that makes star-schema queries feasible on a
    // date-partitioned 100 TB fact table: the scan touches selected
    // days, not the table. The oracle filters by year directly.
    QueryDef("q236_partition_pruning",
      (s, d) => {
        import s.implicits._
        val p = QueryDef.scratch("graft_dpp")
          .resolve("li").toString
        table(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"),
            expr("CAST(floor(l_extendedprice * 100.0) AS BIGINT)").as("price_c"),
            year(col("l_shipdate")).as("ship_year"))
          .write.partitionBy("ship_year").parquet(p)
        val dim = Seq((1994, "keep"), (1995, "keep"), (1996, "drop"),
          (1997, "drop"), (1998, "drop"))
          .toDF("yr", "tag").filter(col("tag") === "keep")
        s.read.parquet(p)
          .join(dim, col("ship_year") === col("yr"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"),
            sum(col("price_c")).as("rev_cents"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
                     SUM(l_quantity) AS qty,
                     CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
                       AS rev_cents
              FROM lineitem
              WHERE EXTRACT(year FROM l_shipdate) IN (1994, 1995)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ANSI SQL DML against the lake table: DELETE FROM / UPDATE
    // statements parsed by SPARK'S OWN parser (sql/SqlDml routes the
    // Catalyst DeleteFromTable/UpdateTable command nodes onto the
    // copy-on-write TxLog verbs), exercising the full expression
    // grammar — IN lists, CASE, arithmetic — in predicates and
    // assignments. The oracle applies the same statements' algebra
    // directly to `orders`, proving statement semantics end to end.
    QueryDef("q237_sql_dml",
      (s, d) => {
        val t = QueryDef.scratch("graft_sqldml")
          .resolve("ords").toString
        graft.sink.TxLogTable.append(
          table(s, d, "orders").select(
            col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
            expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("price_c"))
            .repartition(4), t)
        val reg = Map("ords" -> t)
        graft.sql.SqlDml.run(s,
          "DELETE FROM ords WHERE status = 'O' AND k % 3 = 0", reg)
        graft.sql.SqlDml.run(s,
          "UPDATE ords SET price_c = price_c + " +
            "CASE WHEN k % 2 = 0 THEN 10 ELSE 1 END WHERE k % 11 = 0", reg)
        graft.sink.TxLogTable.read(s, t)
          .groupBy("status")
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("price_cents"))
          .orderBy("status")
      },
      Some("""WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS status,
                     CAST(floor(o_totalprice * 100.0) AS BIGINT) AS price_c
                   FROM orders),
                   kept AS (SELECT * FROM b
                            WHERE NOT (status = 'O' AND k % 3 = 0)),
                   fin AS (SELECT status,
                             price_c + CASE WHEN k % 11 = 0 THEN
                               CASE WHEN k % 2 = 0 THEN 10 ELSE 1 END
                             ELSE 0 END AS price_c
                           FROM kept)
              SELECT status, COUNT(*) AS n,
                     CAST(SUM(price_c) AS BIGINT) AS price_cents
              FROM fin GROUP BY status ORDER BY status""")),

    // Schema evolution on append (mergeSchema): v1 lands half the
    // customers WITHOUT a segment column, v2 appendEvolves the other
    // half WITH it — the committed schema widens, v1's files
    // null-fill the new column on read, and no old byte is rewritten
    // (at 100 TB an ALTER TABLE ADD COLUMN must be a metadata-only
    // operation, which is exactly what the commit log makes it).
    // The oracle rebuilds the same union from `customer`.
    QueryDef("q238_schema_evolution",
      (s, d) => {
        val t = QueryDef.scratch("graft_evolve")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"),
          col("c_mktsegment").as("seg"))
        graft.sink.TxLogTable.append(
          base.filter(col("k") % 2 === 0).drop("seg").repartition(2), t)
        graft.sink.TxLogTable.appendEvolve(
          base.filter(col("k") % 2 === 1).repartition(2), t)
        graft.sink.TxLogTable.read(s, t)
          .groupBy(coalesce(col("seg"), lit("(pre-evolution)")).as("seg"))
          .agg(count(lit(1)).as("n"), sum(col("bal_c")).as("bal_cents"),
            max(col("k")).as("max_k"))
          .orderBy("seg")
      },
      Some("""WITH b AS (SELECT c_custkey AS k,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c,
                     CASE WHEN c_custkey % 2 = 0 THEN '(pre-evolution)'
                          ELSE c_mktsegment END AS seg
                   FROM customer)
              SELECT seg, COUNT(*) AS n,
                     CAST(SUM(bal_c) AS BIGINT) AS bal_cents,
                     MAX(k) AS max_k
              FROM b GROUP BY seg ORDER BY seg""")),

    // RESTORE: v2 deletes a slice (copy-on-write rewrite), v3 rolls
    // the table back to v1 as a METADATA-ONLY commit re-referencing
    // v1's files — no data moves (TxLogTableSpec pins the file-set
    // identity; at 100 TB a bad-load rollback is one log write, not
    // a table rewrite). Fingerprints of all three versions prove the
    // rollback and that the rolled-back version stays travelable.
    QueryDef("q239_txlog_restore",
      (s, d) => {
        val t = QueryDef.scratch("graft_restore")
          .resolve("supp").toString
        val base = table(s, d, "supplier").select(
          col("s_suppkey").as("k"), col("s_nationkey").as("nat"),
          expr("CAST(floor(s_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        graft.sink.TxLogTable.append(base.repartition(3), t) // v1
        val v2 = graft.sink.TxLogTable.delete(s, t, "nat < 5")
        val v3 = graft.sink.TxLogTable.restore(s, t, 1L)
        Seq(1L, v2, v3).map { v =>
          graft.sink.TxLogTable.read(s, t, Some(v))
            .groupBy(lit(v).as("version"))
            .agg(count(lit(1)).as("n_rows"), sum(col("bal_c")).as("bal_cents"),
              min(col("nat")).as("min_nat"))
        }.reduce(_.unionAll(_)).orderBy("version")
      },
      Some("""WITH b AS (SELECT s_suppkey AS k, s_nationkey AS nat,
                     CAST(floor(s_acctbal * 100.0) AS BIGINT) AS bal_c
                   FROM supplier)
              SELECT 1 AS version, COUNT(*) AS n_rows,
                     CAST(SUM(bal_c) AS BIGINT) AS bal_cents,
                     MIN(nat) AS min_nat FROM b
              UNION ALL
              SELECT 2, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(nat)
              FROM b WHERE nat >= 5
              UNION ALL
              SELECT 3, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(nat) FROM b
              ORDER BY version""")),

    // Incremental dedup-index maintenance: the MinHash signature
    // index over a TxLog corpus follows the table through the change
    // feed at O(changed docs) — new crawl docs are hashed and
    // upserted, taken-down docs drop out, and NO unchanged document
    // is ever re-tokenized. At 100 TB re-hashing the corpus per
    // refresh is the cost that kills naive dedup pipelines; this is
    // the signature-index analog of q235's matview. The maintained
    // index is hash-compared against a from-scratch recompute over
    // the final corpus state (the oracle's own minhash algebra).
    QueryDef("q241_incremental_lsh_index",
      (s, d) => {
        val t = QueryDef.scratch("graft_lshidx")
          .resolve("docs").toString
        val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
        graft.sink.TxLogTable.append(
          docs.filter(col("doc_id") % 4 =!= 0).repartition(2), t) // v1: corpus
        val idx0 = graft.ops.Dedup.minhashSignatures(
          graft.sink.TxLogTable.read(s, t, Some(1L)),
          "doc_id", split(col("text"), " "), 4)
        graft.sink.TxLogTable.append(
          docs.filter(col("doc_id") % 4 === 0).repartition(2), t) // v2: new crawl
        val v3 = graft.sink.TxLogTable.delete(s, t, "doc_id % 7 = 0") // takedowns
        val feed = graft.sink.TxLogTable.changes(s, t, 1L, v3)
        // last action per doc decides membership (insert-then-delete nets out)
        val lastAct = feed
          .groupBy("doc_id")
          .agg(max(struct(col("_commit_version"), col("_change_type")))
            .getField("_change_type").as("last_act"))
        val liveInserts = feed.filter(col("_change_type") === "insert")
          .join(lastAct.filter(col("last_act") === "insert"), Seq("doc_id"))
          .select("doc_id", "text")
        graft.ops.Dedup.minhashSignatures(
            liveInserts, "doc_id", split(col("text"), " "), 4)
          .unionByName(
            idx0.join(feed.select("doc_id").distinct(), Seq("doc_id"), "left_anti"))
          .orderBy("doc_id")
      },
      Some("""WITH live AS (SELECT doc_id, text FROM documents
                            WHERE doc_id % 7 <> 0),
                   dw AS (SELECT DISTINCT doc_id, w FROM
                          (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                           FROM live) raw)
              SELECT doc_id,
                MIN(md5('0:' || w)) AS mh0, MIN(md5('1:' || w)) AS mh1,
                MIN(md5('2:' || w)) AS mh2, MIN(md5('3:' || w)) AS mh3
              FROM dw GROUP BY doc_id ORDER BY doc_id""")),

    // Semi-structured processing through Spark 4's VARIANT type:
    // `parse_json` decodes the JSON props column ONCE into the binary
    // variant encoding, and every subsequent `variant_get` is a typed
    // path read — at 100 TB this replaces per-access string
    // re-parsing (q26's get_json_object shape) with a decode-once
    // format, the open-lakehouse answer to JSON columns. Typed
    // extraction, null-path handling and aggregation all ride the
    // variant; the oracle re-derives the same facts with DuckDB's
    // JSON functions.
    QueryDef("q242_variant_props",
      (s, d) => table(s, d, "events")
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"),
          expr("variant_get(v, '$.tag', 'string')").as("tag"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"),
          countDistinct(col("tag")).as("n_tags"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
                     COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
                     CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                       AS sum_k,
                     COUNT(DISTINCT json_extract_string(props, '$.tag')) AS n_tags
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Proactive salted join for known skew: l_returnflag has THREE
    // values (one carrying ~half the fact), so a plain shuffle join
    // on it pins each flag to ONE reducer no matter how wide the
    // cluster — the low-cardinality hot-key join. ops/Skew.saltedJoin
    // salts the fact into 16 sub-keys (deterministic md5 salt on the
    // orderkey) and replicates the 3-row dim ×16, spreading each flag
    // over 16 reducers. Result is provably identical to the plain
    // join (this oracle); the spread property and left-join form are
    // SkewAndBucketingSpec's.
    QueryDef("q243_salted_join",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val dim = li.select(col("l_returnflag")).distinct()
          .withColumn("flag_label", concat(lit("flag-"), col("l_returnflag")))
        graft.ops.Skew.saltedJoin(li, dim, "l_returnflag",
            saltBy = col("l_orderkey"), buckets = 16)
          .groupBy("flag_label")
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
          .orderBy("flag_label")
      },
      Some("""SELECT concat('flag-', l_returnflag) AS flag_label,
                     COUNT(*) AS n, SUM(l_quantity) AS qty
              FROM lineitem GROUP BY l_returnflag ORDER BY flag_label""")),

    // Shallow clone cross-engine: the dev-fork workflow — clone the
    // table (ZERO bytes copied; the commit references the source's
    // files), mutate the CLONE, and fingerprint both ends. The oracle
    // recomputes source (unchanged) and clone (post-DML) straight
    // from `supplier`, proving fork isolation at the data level;
    // TxLogTableSpec proves the zero-copy/materialization mechanics.
    QueryDef("q246_shallow_clone",
      (s, d) => {
        val tmp = QueryDef.scratch("graft_clone")
        val src = tmp.resolve("src").toString
        val dst = tmp.resolve("dev").toString
        val base = table(s, d, "supplier").select(
          col("s_suppkey").as("k"), col("s_nationkey").as("nat"),
          expr("CAST(floor(s_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        graft.sink.TxLogTable.append(base.repartition(3), src)
        graft.sink.TxLogTable.shallowClone(s, src, dst)
        graft.sink.TxLogTable.delete(s, dst, "nat >= 10")
        graft.sink.TxLogTable.update(s, dst, "k % 2 = 0",
          Map("bal_c" -> "bal_c + 50"))
        def fp(side: String, t: String) = graft.sink.TxLogTable.read(s, t)
          .groupBy(lit(side).as("side"))
          .agg(count(lit(1)).as("n"), sum(col("bal_c")).as("bal_cents"),
            max(col("nat")).as("max_nat"))
        fp("clone", dst).unionAll(fp("source", src)).orderBy("side")
      },
      Some("""WITH b AS (SELECT s_suppkey AS k, s_nationkey AS nat,
                     CAST(floor(s_acctbal * 100.0) AS BIGINT) AS bal_c
                   FROM supplier),
                   cl AS (SELECT k, nat,
                            bal_c + CASE WHEN k % 2 = 0 THEN 50 ELSE 0 END AS bal_c
                          FROM b WHERE nat < 10)
              SELECT 'clone' AS side, COUNT(*) AS n,
                     CAST(SUM(bal_c) AS BIGINT) AS bal_cents,
                     MAX(nat) AS max_nat FROM cl
              UNION ALL
              SELECT 'source', COUNT(*), CAST(SUM(bal_c) AS BIGINT), MAX(nat)
              FROM b
              ORDER BY side""")),

    // TPC-H Q18 (large-volume customers): the HAVING-subquery
    // semi-join composite. The per-order quantity aggregate feeds a
    // semi-join back onto orders (shuffle on orderkey, no broadcast —
    // the qualifying set scales with the fact), then the customer dim
    // joins and the final per-order aggregate re-groups. Catalyst
    // plans agg → semi-join → join → agg with partial aggregation on
    // every shuffle; TakeOrderedAndProject bounds the output. Money
    // as integer cents keeps the DESC ordering engine-exact.
    QueryDef("q244_tpch_q18",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val big = li.groupBy("l_orderkey")
          .agg(sum(col("l_quantity")).as("order_qty"))
          .filter(col("order_qty") > 250)
        table(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(table(s, d, "customer"), col("c_custkey") === col("o_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("odate"),
            expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("price_c"),
            col("order_qty"))
          .orderBy(col("price_c").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey,
                     CAST(o_orderdate AS DATE) AS odate,
                     CAST(floor(o_totalprice * 100.0) AS BIGINT) AS price_c,
                     SUM(l_quantity) AS order_qty
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
              GROUP BY 1, 2, 3, 4, 5
              ORDER BY price_c DESC, o_orderkey LIMIT 100""")),

    // TPC-H Q21's shape (suppliers who kept orders waiting) on this
    // schema: late = shipped more than 60 days after the order date.
    // The hard part is the DOUBLE correlated quantifier on the same
    // fact — EXISTS (another supplier on the order) AND NOT EXISTS
    // (another LATE supplier on the order) — planned as a left-semi
    // and a left-anti join against two projections of lineitem, both
    // shuffling on orderkey (co-partitioned with the probe; no
    // broadcast, all sides scale with the fact). The finding: the
    // sole supplier responsible for a multi-supplier order's delay.
    QueryDef("q245_tpch_q21_shape",
      (s, d) => {
        val o = table(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val li = table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val l1 = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL '60' DAY"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        val l2 = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk2"))
        val withOther = l1.join(
          l2.withColumnRenamed("ok", "ok2"),
          col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
        val lateL3 = l1.select(col("ok").as("ok3"), col("sk").as("sk3"))
        val sole = withOther.join(lateL3,
          col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
        sole.join(table(s, d, "supplier"), col("sk") === col("s_suppkey"))
          .join(table(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
          .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_12"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""WITH l1 AS (
                SELECT DISTINCT l.l_orderkey AS ok, l.l_suppkey AS sk
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_orderstatus = 'F'
                  AND l.l_shipdate > o.o_orderdate + INTERVAL '60 days')
              SELECT s_name, COUNT(*) AS numwait
              FROM l1
              JOIN supplier ON sk = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_12')
                AND EXISTS (SELECT 1 FROM lineitem l2
                            WHERE l2.l_orderkey = l1.ok
                              AND l2.l_suppkey <> l1.sk)
                AND NOT EXISTS (SELECT 1 FROM l1 l3
                                WHERE l3.ok = l1.ok AND l3.sk <> l1.sk)
              GROUP BY s_name
              ORDER BY numwait DESC, s_name LIMIT 100""")),

    // CHECK constraints as the sink's data-quality gate: two
    // constraints are added after a clean first batch; a corrupted
    // batch (negated prices) is REJECTED atomically — no partial
    // commit, the table keeps its version — and a second clean batch
    // lands normally. The final fingerprint therefore contains
    // exactly the two clean slices, which is what the oracle
    // recomputes from `part`. Enforcement mechanics (NULL semantics,
    // checkpoint survival, update gating) are TxLogTableSpec's.
    QueryDef("q240_check_constraints",
      (s, d) => {
        val t = QueryDef.scratch("graft_check")
          .resolve("part").toString
        val base = table(s, d, "part").select(
          col("p_partkey").as("k"), col("p_size").as("size"),
          expr("CAST(floor(p_retailprice * 100.0) AS BIGINT)").as("price_c"))
        graft.sink.TxLogTable.append(
          base.filter(col("k") % 3 === 0).repartition(2), t)
        graft.sink.TxLogTable.addConstraint(s, t, "pos_size", "size > 0")
        graft.sink.TxLogTable.addConstraint(s, t, "pos_price", "price_c >= 0")
        val corrupted = base.filter(col("k") % 3 === 1)
          .withColumn("price_c", -col("price_c") - 1)
        val rejected =
          try { graft.sink.TxLogTable.append(corrupted.repartition(2), t); 0L }
          catch { case _: graft.sink.TxLogTable.ConstraintViolation => 1L }
        graft.sink.TxLogTable.append(
          base.filter(col("k") % 3 === 2).repartition(2), t)
        graft.sink.TxLogTable.read(s, t)
          .groupBy((col("k") % 3).as("slice"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("price_cents"),
            max(col("size")).as("max_size"))
          .withColumn("batch_rejected", lit(rejected))
          .orderBy("slice")
      },
      Some("""SELECT p_partkey % 3 AS slice, COUNT(*) AS n,
                     CAST(SUM(CAST(floor(p_retailprice * 100.0) AS BIGINT)) AS BIGINT)
                       AS price_cents,
                     MAX(p_size) AS max_size,
                     CAST(1 AS BIGINT) AS batch_rejected
              FROM part WHERE p_partkey % 3 IN (0, 2)
              GROUP BY slice ORDER BY slice"""))
  )
}
