package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Corpus, Layout, Merge}
import QueryDef.table

/** Round-3 operator widening: reshaping (unpivot), exact rank-based
  * percentiles, full-outer set reconciliation, repetition-based
  * quality signals, inverted-index construction, Bloom-prefiltered
  * decontamination, SCD-1 merge/upsert, time-range rolling windows,
  * cross-join dense grids, and date arithmetic.
  *
  * Determinism rules (see memory/graft-correctness-rules): decimal
  * sums for money, no round() on emitted doubles, total ORDER BY on
  * row-level outputs, BIGINT casts wherever DuckDB would widen to
  * HUGEINT.
  */
object Extras {

  import Money.DSUM

  /** Oracle fragment: word 3-gram shingles with whole-text fallback —
    * mirrors Dedup.shingles (same as PipelineOps.shinglesSql).
    */
  private def shinglesSql(src: String): String =
    s"""(SELECT DISTINCT doc_id, s FROM
          (SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s FROM
            (SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 1, 2))) AS i FROM
              (SELECT doc_id, string_split(text, ' ') AS w FROM $src) ws) t1) t2)"""

  val all: Seq[QueryDef] = Seq(

    // wide→long reshape: Spark's native unpivot (map-only — each input
    // row emits its measures locally; no shuffle, partitioning follows
    // the scan). Total ORDER BY because lineitem keys are duplicated.
    QueryDef("q83_unpivot",
      (s, d) => table(s, d, "lineitem")
        .filter(col("l_orderkey") <= 1000)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure", "val"),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
              FROM lineitem WHERE l_orderkey <= 1000
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS val
              FROM lineitem WHERE l_orderkey <= 1000
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_discount' AS measure, l_discount AS val
              FROM lineitem WHERE l_orderkey <= 1000
              ORDER BY l_orderkey, l_linenumber, measure, val""")),

    // exact per-group percentiles, rank-based (percentile_disc
    // semantics): value at row ceil(p*n) of the sorted group. Pure
    // selection — no interpolation arithmetic, so the emitted doubles
    // are raw input values and hash-stable across engines. Ranks come
    // from Ranks.groupRanked (range repartition + per-partition
    // offsets), NOT a partitionBy(priority) window: 5 groups would cap
    // the rank pass at 5 reducers forever.
    QueryDef("q84_percentile_disc",
      (s, d) => {
        graft.ops.Ranks.groupRanked(
            table(s, d, "orders").select(col("o_orderpriority"), col("o_totalprice")),
            "o_orderpriority", "o_totalprice")
          .groupBy("o_orderpriority")
          .agg(
            max(when(col("rn") === ceil(col("n") * 0.5), col("o_totalprice"))).as("p50"),
            max(when(col("rn") === ceil(col("n") * 0.9), col("o_totalprice"))).as("p90"),
            max(when(col("rn") === ceil(col("n") * 0.99), col("o_totalprice"))).as("p99"),
            count(lit(1)).as("n_rows"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH r AS (
                SELECT o_orderpriority, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
                  COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
                FROM orders)
              SELECT o_orderpriority,
                MAX(CASE WHEN rn = CEIL(n * 0.5) THEN o_totalprice END) AS p50,
                MAX(CASE WHEN rn = CEIL(n * 0.9) THEN o_totalprice END) AS p90,
                MAX(CASE WHEN rn = CEIL(n * 0.99) THEN o_totalprice END) AS p99,
                COUNT(*) AS n_rows
              FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // full-outer reconciliation: high-balance customers vs a supplier
    // subset per nation — both sides pre-aggregated (shuffle carries
    // one row per nation, not the raw tables), then full-outer +
    // coalesce zero-fill.
    QueryDef("q85_full_outer",
      (s, d) => {
        val c = table(s, d, "customer").filter(col("c_acctbal") > 9000)
          .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
        val sup = table(s, d, "supplier").filter(col("s_suppkey") % 3 === 0)
          .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
        c.join(sup, col("c_nationkey") === col("s_nationkey"), "full_outer")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""WITH c AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
                         WHERE c_acctbal > 9000 GROUP BY c_nationkey),
                   s AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
                         WHERE s_suppkey % 3 = 0 GROUP BY s_nationkey)
              SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
                COALESCE(c.n_cust, 0) AS n_cust,
                COALESCE(s.n_supp, 0) AS n_supp
              FROM c FULL OUTER JOIN s ON s.s_nationkey = c.c_nationkey
              ORDER BY nationkey""")),

    // Gopher-style repetition signals: most-frequent-token fraction +
    // distinct-token fraction per doc. explode → two-level hash agg;
    // map-side partial agg collapses (doc, token) before the shuffle,
    // so shuffle volume is the per-doc vocabulary, not the token
    // stream. Ratios are IEEE quotients of exact integers — portable.
    QueryDef("q86_repetition_ratio",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tokens"), max("c").as("top_cnt"),
          count(lit(1)).as("n_distinct"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_cnt"),
          (col("top_cnt").cast(DoubleType) / col("n_tokens")).as("top_frac"),
          (col("n_distinct").cast(DoubleType) / col("n_tokens")).as("distinct_frac"))
        .orderBy("doc_id"),
      Some("""WITH tc AS (
                SELECT doc_id, tok, COUNT(*) AS c FROM
                  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
                GROUP BY doc_id, tok),
              agg AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                  CAST(MAX(c) AS BIGINT) AS top_cnt,
                  CAST(COUNT(*) AS BIGINT) AS n_distinct
                FROM tc GROUP BY doc_id)
              SELECT doc_id, n_tokens, n_distinct, top_cnt,
                CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_frac,
                CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS distinct_frac
              FROM agg ORDER BY doc_id""")),

    // inverted-index build: mid-frequency terms → document-frequency +
    // first-10 posting list. collect_list order is engine-defined, so
    // the list is sorted before slicing (sort_array) — the only
    // deterministic form. Posting lists stay bounded (slice) so a
    // hot term can't blow up a reducer at corpus scale.
    QueryDef("q87_inverted_index",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("df"),
          // joined to a CSV string: the driver's pandas hash can't
          // factorize array cells, and a flat string is just as usable
          array_join(slice(sort_array(collect_list(col("doc_id"))), 1, 10), ",")
            .as("postings"))
        .filter(col("df") >= 100)
        .orderBy("term"),
      Some("""WITH dw AS (SELECT DISTINCT doc_id, term FROM
                (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t)
              SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',') AS postings
              FROM dw GROUP BY term
              HAVING COUNT(*) >= 100
              ORDER BY term""")),

    // decontamination with a scan-side Bloom pre-filter (no false
    // negatives; exact confirm join) — result is identical to the
    // exact n-gram overlap, verified against the same oracle shape as
    // q74. The split (% 89) differs from q74's so both paths stay
    // independently covered.
    QueryDef("q88_bloom_decontaminate",
      (s, d) => {
        val docs = table(s, d, "documents")
        Corpus.decontaminateBloom(
            docs.filter(col("doc_id") % 89 =!= 0),
            docs.filter(col("doc_id") % 89 === 0),
            "doc_id", "text", n = 3,
            expectedGrams = 100000L, fpp = 0.01)
          .orderBy("doc_id")
      },
      Some(s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 89 <> 0),
              bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 89 = 0),
              cg AS ${shinglesSql("corpus")},
              bg AS (SELECT doc_id AS bench_id, s FROM ${shinglesSql("bench")} b0),
              hits AS (SELECT cg.doc_id, cg.s, bg.bench_id FROM cg JOIN bg ON bg.s = cg.s)
              SELECT doc_id, CAST(COUNT(DISTINCT s) AS BIGINT) AS n_shared_grams,
                MIN(bench_id) AS first_bench_id
              FROM hits GROUP BY doc_id ORDER BY doc_id""")),

    // SCD-1 merge/upsert: a derived change batch (updates win on key,
    // inserts append) applied via full-outer + coalesce, then audited
    // by segment. Decimal sum for the money column.
    QueryDef("q89_merge_upsert",
      (s, d) => {
        val cust = table(s, d, "customer")
        val updates = cust.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            (col("c_acctbal") + 1000.0).as("c_acctbal"),
            lit("MERGED").as("c_mktsegment"))
        val inserts = cust.filter(col("c_custkey") % 100 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"), col("c_name"),
            col("c_nationkey"), col("c_acctbal"),
            lit("INSERTED").as("c_mktsegment"))
        Merge.upsert(cust, updates.unionAll(inserts), "c_custkey")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("c_acctbal").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_bal"))
          .orderBy("c_mktsegment")
      },
      Some(s"""WITH updates AS (
                SELECT c_custkey, c_name, c_nationkey,
                  c_acctbal + 1000.0 AS c_acctbal, 'MERGED' AS c_mktsegment
                FROM customer WHERE c_custkey % 10 = 0
                UNION ALL
                SELECT c_custkey + 1000000, c_name, c_nationkey,
                  c_acctbal, 'INSERTED'
                FROM customer WHERE c_custkey % 100 = 0),
              merged AS (
                SELECT COALESCE(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
                  COALESCE(u.c_acctbal, b.c_acctbal) AS c_acctbal
                FROM customer b FULL OUTER JOIN updates u ON u.c_custkey = b.c_custkey)
              SELECT c_mktsegment, COUNT(*) AS n_rows,
                ${DSUM("c_acctbal")} AS sum_bal
              FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // rolling 7-day spend per customer: RANGE frame over event-time
    // seconds (value-based, not row-based — handles gaps and same-day
    // ties identically in any engine). Decimal window sum: exact,
    // order-free, so the frame result is hash-stable.
    QueryDef("q90_rolling_window",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          // NTZ → TIMESTAMP → epoch seconds (session TZ pinned UTC, no shift)
          .orderBy(col("o_orderdate").cast(TimestampType).cast(LongType))
          .rangeBetween(-6L * 86400L, 0L)
        table(s, d, "orders")
          .filter(col("o_custkey") <= 50)
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
            sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
              .cast(DoubleType).as("spend_7d"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey", "spend_7d")
      },
      Some("""SELECT o_custkey, o_orderdate, o_orderkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS spend_7d
              FROM orders WHERE o_custkey <= 50
              ORDER BY o_custkey, o_orderdate, o_orderkey, spend_7d""")),

    // dense grid: nation × order-priority cross join, zero-filled from
    // a pre-aggregated fact rollup. Cross join is dims-only (25 × 5
    // rows) — the fact table is aggregated BEFORE it meets the grid,
    // and the grid side broadcasts.
    QueryDef("q91_cross_grid",
      (s, d) => {
        val prios = table(s, d, "orders").select("o_orderpriority").distinct()
        val grid = table(s, d, "nation")
          .select(col("n_nationkey"), col("n_name")).crossJoin(prios)
        val counts = table(s, d, "orders")
          .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .withColumnRenamed("o_orderpriority", "cp")
        // counts is a post-agg dim×dim frame (|nation|×|priority| rows);
        // static stats can't see that, so hint the broadcast explicitly
        grid.join(broadcast(counts),
            grid("n_nationkey") === counts("c_nationkey") &&
              grid("o_orderpriority") === counts("cp"), "left")
          .select(col("n_name"), col("o_orderpriority"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("n_name", "o_orderpriority")
      },
      Some("""WITH prios AS (SELECT DISTINCT o_orderpriority FROM orders),
              counts AS (SELECT c_nationkey, o_orderpriority, COUNT(*) AS n_orders
                         FROM orders JOIN customer ON o_custkey = c_custkey
                         GROUP BY c_nationkey, o_orderpriority)
              SELECT n.n_name, p.o_orderpriority, COALESCE(c.n_orders, 0) AS n_orders
              FROM nation n CROSS JOIN prios p
              LEFT JOIN counts c ON c.c_nationkey = n.n_nationkey
                AND c.o_orderpriority = p.o_orderpriority
              ORDER BY n.n_name, p.o_orderpriority""")),

    // date arithmetic: order→ship delay histogram. Whole-day datediff
    // on DATE-truncated values (identical semantics both engines);
    // fact-fact equi-join on the natural key then a tiny hash agg.
    QueryDef("q92_ship_delay",
      (s, d) => table(s, d, "lineitem")
        .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast(LongType).as("delay_days"))
        .groupBy("delay_days").agg(count(lit(1)).as("n"))
        .orderBy("delay_days"),
      Some("""SELECT date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
                  AS delay_days,
                COUNT(*) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY delay_days ORDER BY delay_days""")),

    // window-function long tail: ntile bucketing, cumulative
    // distribution, nth_value with the default running frame. The
    // ordering key (acctbal, custkey) is unique, so RANGE peers are
    // single rows and every function is deterministic cross-engine.
    QueryDef("q93_window_extras",
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal"), col("c_custkey"))
        table(s, d, "customer")
          .filter(col("c_nationkey") <= 4)
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            ntile(4).over(w).cast(LongType).as("quartile"),
            cume_dist().over(w).as("cdist"),
            nth_value(col("c_acctbal"), 2).over(w).as("second_bal"))
          .orderBy("c_nationkey", "c_acctbal", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal,
                NTILE(4) OVER w AS quartile,
                CUME_DIST() OVER w AS cdist,
                NTH_VALUE(c_acctbal, 2) OVER w AS second_bal
              FROM customer WHERE c_nationkey <= 4
              WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
              ORDER BY c_nationkey, c_acctbal, c_custkey""")),

    // scalar string-function surface: case mapping, substring, pad,
    // reverse, translate, split-part, length, ascii, concat —
    // all codegen'd built-ins, map-only over the scan.
    QueryDef("q94_string_funcs",
      (s, d) => table(s, d, "part")
        .filter(col("p_partkey") <= 2000)
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          substring(col("p_name"), 1, 5).as("name5"),
          lpad(col("p_partkey").cast(StringType), 10, "0").as("key_pad"),
          reverse(col("p_brand")).as("brand_rev"),
          translate(col("p_type"), "aeiou", "_____").as("type_tr"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          length(col("p_name")).cast(LongType).as("name_len"),
          ascii(substring(col("p_name"), 1, 1)).cast(LongType).as("first_ascii"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cat"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                upper(p_brand) AS brand_u,
                lower(p_type) AS type_l,
                substr(p_name, 1, 5) AS name5,
                lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_pad,
                reverse(p_brand) AS brand_rev,
                translate(p_type, 'aeiou', '_____') AS type_tr,
                split_part(p_name, ' ', 1) AS first_word,
                CAST(length(p_name) AS BIGINT) AS name_len,
                CAST(ascii(substr(p_name, 1, 1)) AS BIGINT) AS first_ascii,
                concat_ws('|', p_brand, p_type) AS cat
              FROM part WHERE p_partkey <= 2000 ORDER BY p_partkey""")),

    // null-handling semantics: nullif-derived nulls, count(col) vs
    // count(*), explicit null counting, coalesce fill — the dropna /
    // fillna surface as aggregates.
    QueryDef("q95_null_handling",
      (s, d) => table(s, d, "orders")
        .select(col("o_orderpriority"),
          nullif(col("o_orderstatus"), lit("O")).as("st"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_rows"),
          count(col("st")).as("n_nonnull"),
          count(when(col("st").isNull, 1)).as("n_null"),
          max(coalesce(col("st"), lit("FILLED"))).as("max_filled"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                COUNT(*) AS n_rows,
                COUNT(NULLIF(o_orderstatus, 'O')) AS n_nonnull,
                COUNT(CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 1 END) AS n_null,
                MAX(COALESCE(NULLIF(o_orderstatus, 'O'), 'FILLED')) AS max_filled
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Z-order clustering key: Morton-interleave two filter dimensions
    // and audit locality per curve segment — every zbucket spans a
    // narrow rectangle in BOTH dims, which is what lets file-level
    // min/max stats prune range scans on either one after a
    // repartitionByRange(z) layout write.
    QueryDef("q98_zorder",
      (s, d) => {
        val p = table(s, d, "part").select(
          (col("p_size").cast(LongType).bitwiseAND(lit(63L))).as("sa"),
          (length(col("p_name")).cast(LongType).bitwiseAND(lit(63L))).as("sb"))
        p.select(col("sa"), col("sb"),
            shiftright(Layout.zValue(col("sa"), col("sb"), 6), 6).as("zbucket"))
          .groupBy("zbucket")
          .agg(count(lit(1)).as("n"),
            min("sa").as("size_min"), max("sa").as("size_max"),
            min("sb").as("len_min"), max("sb").as("len_max"))
          .orderBy("zbucket")
      },
      Some(s"""WITH p AS (
                SELECT CAST(p_size & 63 AS BIGINT) AS sa,
                  CAST(length(p_name) & 63 AS BIGINT) AS sb
                FROM part),
              z AS (SELECT sa, sb, (${zSql("sa", "sb", 6)}) >> 6 AS zbucket FROM p)
              SELECT zbucket, COUNT(*) AS n,
                MIN(sa) AS size_min, MAX(sa) AS size_max,
                MIN(sb) AS len_min, MAX(sb) AS len_max
              FROM z GROUP BY zbucket ORDER BY zbucket""")),

    // equi-width histogram: global [min,max] in one tiny agg
    // (broadcast), bucket assignment map-side with a hand-rolled
    // formula written identically in both engines (builtin
    // width_bucket boundary conventions differ across engines).
    QueryDef("q100_histogram",
      (s, d) => {
        val o = table(s, d, "orders")
        val stats = o.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
        o.crossJoin(broadcast(stats))
          .select(least(
            floor((col("o_totalprice") - col("lo")) / (col("hi") - col("lo")) * 10)
              .cast(LongType), lit(9L)).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      },
      Some("""WITH s AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
              b AS (SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / (hi - lo) * 10) AS BIGINT), 9)
                      AS bucket
                    FROM orders, s)
              SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket ORDER BY bucket""")),

    // calendar navigation: month start/end boundaries and month length
    // per order month — trunc/last_day/datediff written in the DATE
    // domain, where both engines agree exactly.
    QueryDef("q101_date_funcs",
      (s, d) => {
        val o = table(s, d, "orders")
          .select(to_date(col("o_orderdate")).as("od"))
        o.select(trunc(col("od"), "month").as("month_start"),
            last_day(col("od")).as("month_end"))
          .groupBy("month_start", "month_end")
          .agg(count(lit(1)).as("n_orders"))
          .withColumn("days_in_month",
            (datediff(col("month_end"), col("month_start")) + 1).cast(LongType))
          .orderBy("month_start")
      },
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                last_day(CAST(o_orderdate AS DATE)) AS month_end,
                COUNT(*) AS n_orders,
                CAST(date_diff('day', CAST(date_trunc('month', o_orderdate) AS DATE),
                  last_day(CAST(o_orderdate AS DATE))) + 1 AS BIGINT) AS days_in_month
              FROM orders
              GROUP BY month_start, month_end ORDER BY month_start""")),

    // typed cogroup: per-key reconciliation of two datasets with
    // arbitrary Scala logic — one shuffle per side, then a streaming
    // per-key merge (neither side materializes beyond the key group).
    // Money sums accumulate in exact BigDecimal scaled like the SQL
    // DECIMAL(18,4) cast, so the fold is order-insensitive and
    // engine-portable despite being handwritten.
    QueryDef("q102_cogroup",
      (s, d) => {
        import s.implicits._
        val cust = table(s, d, "customer")
          .select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
          .as[(Long, Double)]
        val orders = table(s, d, "orders")
          .select(col("o_custkey").as("k"), col("o_totalprice").as("v"))
          .as[(Long, Double)]
        cust.groupByKey(_._1).cogroup(orders.groupByKey(_._1)) { (k, cs, os) =>
          if (!cs.hasNext) Iterator.empty // orders for unknown customers drop
          else {
            var n = 0L
            var total = BigDecimal(0).setScale(4)
            os.foreach { o =>
              n += 1
              total += BigDecimal(o._2).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            }
            Iterator((k, n, total.toDouble))
          }
        }.toDF("custkey", "n_orders", "total_spend")
          .orderBy("custkey")
      },
      Some("""SELECT c_custkey AS custkey,
                CAST(COUNT(o.o_custkey) AS BIGINT) AS n_orders,
                CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE)
                  AS total_spend
              FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
              GROUP BY c_custkey ORDER BY custkey"""))
  )

  /** Oracle fragment: Morton interleave of the low `bits` of a and b —
    * mirrors [[graft.ops.Layout.zValue]].
    */
  private def zSql(a: String, b: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) | ((($b >> $i) & 1) << ${2 * i})")
      .mkString(" | ")
}
