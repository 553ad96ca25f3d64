package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Second operator batch: SQL-surface queries (subqueries, grouping
  * sets), exact moment statistics, range/as-of joins, deterministic
  * sampling, and corpus/vector aggregates.
  *
  * Determinism contract is the same as Relational: decimal-space sums,
  * no double-space rounds, total ORDER BY.
  */
object Extended {

  import Money.{dsum, DSUM, dsum8, DSUM8}

  val all: Seq[QueryDef] = Seq(

    // BPE-ish subword pre-tokenization: letter runs / digit runs /
    // single symbols via regexp_extract_all (RE2-safe → oracle-able)
    QueryDef("q39_subword_count",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast(LongType).as("n_subwords"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_subwords
              FROM documents ORDER BY doc_id""")),

    // cube (full grouping-sets lattice)
    QueryDef("q46_cube",
      (s, d) => table(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                ${DSUM("l_quantity")} AS sum_qty
              FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // explicit grouping sets through the SQL surface (Spark SQL parser)
    QueryDef("q47_grouping_sets",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("v47_orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
                 FROM v47_orders
                 GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                 ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // moment statistics, exact: stddev from decimal sums (engine-portable
    // IEEE arithmetic on identical inputs — no stddev_samp builtin, whose
    // merge order varies)
    QueryDef("q48_stats_agg",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val n = count(lit(1))
        val sx = dsum(col("l_quantity"))
        val sxx = dsum8(col("l_quantity") * col("l_quantity"))
        li.groupBy("l_returnflag")
          .agg(
            n.as("n"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            countDistinct(col("l_quantity")).as("n_distinct_qty"),
            sqrt((sxx - sx * sx / n) / (n - lit(1))).as("stddev_qty"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
                CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct_qty,
                SQRT((${DSUM8("l_quantity * l_quantity")} - ${DSUM("l_quantity")} * ${DSUM("l_quantity")} / COUNT(*))
                     / (COUNT(*) - 1)) AS stddev_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Pearson correlation, exact, from decimal co-moments
    QueryDef("q49_corr",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val n = count(lit(1))
        val sx = dsum(col("l_quantity"))
        val sy = dsum(col("l_extendedprice"))
        val sxy = dsum8(col("l_quantity") * col("l_extendedprice"))
        val sxx = dsum8(col("l_quantity") * col("l_quantity"))
        val syy = dsum8(col("l_extendedprice") * col("l_extendedprice"))
        li.groupBy("l_returnflag")
          .agg(n.as("n"),
            ((sxy - sx * sy / n) /
              (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))).as("corr_qty_price"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                (${DSUM8("l_quantity * l_extendedprice")} - ${DSUM("l_quantity")} * ${DSUM("l_extendedprice")} / COUNT(*))
                / (SQRT(${DSUM8("l_quantity * l_quantity")} - ${DSUM("l_quantity")} * ${DSUM("l_quantity")} / COUNT(*))
                   * SQRT(${DSUM8("l_extendedprice * l_extendedprice")} - ${DSUM("l_extendedprice")} * ${DSUM("l_extendedprice")} / COUNT(*)))
                  AS corr_qty_price
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // correlated EXISTS + uncorrelated IN + scalar subquery, via SQL
    QueryDef("q50_subqueries",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("v50_customer")
        table(s, d, "orders").createOrReplaceTempView("v50_orders")
        s.sql("""SELECT c_custkey, c_name,
                   (SELECT COUNT(*) FROM v50_orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
                 FROM v50_customer c
                 WHERE EXISTS (SELECT 1 FROM v50_orders o
                               WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
                   AND c.c_nationkey IN (SELECT c_nationkey FROM v50_customer
                                         GROUP BY c_nationkey HAVING COUNT(*) >= 3)
                 ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name,
                (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
              FROM customer c
              WHERE EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
                AND c.c_nationkey IN (SELECT c_nationkey FROM customer
                                      GROUP BY c_nationkey HAVING COUNT(*) >= 3)
              ORDER BY c_custkey""")),

    // the classic distributed word count (explode → partial-agg → top-k)
    QueryDef("q51_word_count",
      (s, d) => table(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w"))
        .limit(20),
      Some("""SELECT w, COUNT(*) AS n
              FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
              GROUP BY w ORDER BY n DESC, w LIMIT 20""")),

    // JSON path extraction (get_json_object ↔ json_extract_string)
    QueryDef("q52_json_extract",
      (s, d) => table(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
              FROM events GROUP BY k ORDER BY k""")),

    // range join: views within 5 minutes after a click by the same user
    QueryDef("q53_range_join",
      (s, d) => {
        val ev = table(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("click_ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"))
        clicks.join(views, Seq("user_id"))
          .filter(col("view_ts") > col("click_ts") &&
            col("view_ts") <= col("click_ts") + expr("INTERVAL '5' MINUTE"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_followups"))
          .orderBy("user_id")
      },
      Some("""SELECT c.user_id, COUNT(*) AS n_followups
              FROM (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click') c
              JOIN (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view') v
                ON c.user_id = v.user_id
               AND v.view_ts > c.click_ts
               AND v.view_ts <= c.click_ts + INTERVAL '5 minutes'
              GROUP BY c.user_id ORDER BY c.user_id""")),

    // as-of join via the union-sort trick: for each purchase, the most
    // recent click of the same user at or before it. One shuffle on
    // (user_id), no per-pair blowup — the scalable as-of pattern.
    QueryDef("q54_asof_join",
      (s, d) => {
        val ev = table(s, d, "events")
        val tagged = ev
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_id"), col("ts"),
            when(col("event_type") === "click", 0).otherwise(1).as("kind"))
        // clicks sort before purchases at equal ts → "at or before"
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tagged
          .withColumn("last_click_ts",
            last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("user_id"), col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
            date_format(col("last_click_ts"), "yyyy-MM-dd HH:mm:ss").as("asof_click_ts"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT p.user_id, p.event_id,
                STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
                STRFTIME((SELECT MAX(c.ts) FROM events c
                          WHERE c.user_id = p.user_id AND c.event_type = 'click'
                            AND c.ts <= p.ts), '%Y-%m-%d %H:%M:%S') AS asof_click_ts
              FROM events p WHERE p.event_type = 'purchase'
              ORDER BY p.user_id, p.event_id""")),

    // deterministic hash sampling — engine-portable (md5, not rand())
    QueryDef("q56_hash_sample",
      (s, d) => table(s, d, "orders")
        .filter(substring(md5(col("o_orderkey").cast(StringType)), 1, 1) === "0")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price")),
      Some(s"""SELECT COUNT(*) AS n, ${DSUM("o_totalprice")} AS sum_price
              FROM orders WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'""")),

    // corpus document frequency (distinct-word explode → df counts)
    QueryDef("q58_doc_frequency",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
        .groupBy("w")
        .agg(countDistinct(col("doc_id")).as("df"))
        .orderBy(col("df").desc, col("w"))
        .limit(25),
      Some("""SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
              GROUP BY w ORDER BY df DESC, w LIMIT 25""")),

    // salted two-stage aggregation: identical result to the plain
    // group-by (the oracle IS the plain group-by), with hot-key
    // pressure spread over 16 pre-aggregation buckets — the skew
    // remedy for aggregations with known-hot keys
    QueryDef("q60_salted_agg",
      (s, d) => graft.ops.Skew.saltedSumCount(
          table(s, d, "lineitem"), Seq("l_returnflag"), "l_quantity",
          saltCol = col("l_orderkey"), saltBuckets = 16)
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_value
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // typed Dataset API: custom Aggregator[IN, BUF, OUT] with an exact
    // integer-cents buffer (merge-order independent)
    QueryDef("q61_typed_agg",
      (s, d) => {
        import s.implicits._
        val orders = table(s, d, "orders")
          .select(col("o_orderpriority"), col("o_totalprice"))
          .as[(String, Double)]
        orders.groupByKey(_._1)
          .agg(graft.ops.TypedAgg.exactMean[(String, Double)](_._2, "avg_price"))
          .toDF("o_orderpriority", "avg_price")
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // character-shingle MinHash fingerprint (the rolling-hash document
    // fingerprint, SQL-expressible form): hash every k-char window,
    // keep the lexicographic min — robust to word-boundary edits
    QueryDef("q62_charshingle_fp",
      (s, d) => {
        val k = 8
        table(s, d, "documents")
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1))))
              .as("i"))
          .select(col("doc_id"), md5(col("text").substr(col("i"), lit(k))).as("h"))
          .groupBy("doc_id")
          .agg(min(col("h")).as("fp_min"), count(lit(1)).as("n_windows"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, MIN(md5(substring(text, i, 8))) AS fp_min,
                COUNT(*) AS n_windows
              FROM (SELECT doc_id, text,
                      unnest(range(1, GREATEST(length(text) - 7, 1) + 1)) AS i
                    FROM documents) t
              GROUP BY doc_id ORDER BY doc_id""")),

    // TF-IDF-style most-distinctive term per doc, float-free ranking:
    // highest in-doc tf, then LOWEST corpus df, then lexicographic —
    // integer ordering is engine-portable (ln-based idf is not: libm
    // vs Math.log can differ in the last ulp)
    QueryDef("q63_top_term",
      (s, d) => {
        val docs = table(s, d, "documents")
        val terms = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        // ONE tokenize pass: df(w) = #docs containing w = row count of
        // the tf frame per w — checkpointed so its two consumers (join
        // side and df rollup) don't re-run the corpus explode
        val tf = terms.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
          .transform(graft.ops.Pinned.pin)
        val df_ = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("w").asc)
        tf.join(df_, "w")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("w").as("top_term"), col("tf"), col("df"))
          .orderBy("doc_id")
      },
      Some("""WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
              tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM terms GROUP BY doc_id, w),
              df AS (SELECT w, COUNT(*) AS df
                     FROM (SELECT DISTINCT doc_id, w FROM terms) x GROUP BY w)
              SELECT doc_id, w AS top_term, tf, df FROM (
                SELECT tf.doc_id, tf.w, tf.tf, df.df,
                  ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                    ORDER BY tf.tf DESC, df.df ASC, tf.w ASC) AS rn
                FROM tf JOIN df ON tf.w = df.w) ranked
              WHERE rn = 1 ORDER BY doc_id""")),

    // TPC-H Q5 shape: local-supplier revenue per nation within a
    // region — exercises region/nation/supplier plus the
    // customer-and-supplier-same-nation join predicate
    QueryDef("q64_regional_revenue",
      (s, d) => {
        val region = broadcast(table(s, d, "region").filter(col("r_name") === "ASIA"))
        val nation = broadcast(table(s, d, "nation"))
        val supplier = broadcast(table(s, d, "supplier"))
        table(s, d, "lineitem")
          .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(supplier, col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
          .join(nation, col("s_nationkey") === col("n_nationkey"))
          .join(region, col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, COUNT(*) AS n,
                ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
              FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
              GROUP BY n_name ORDER BY n_name""")),

    // window-function variety: rank / dense_rank / lead / first_value /
    // percent_rank over one keyed window (integer ranks + one exact
    // quotient — engine-portable)
    QueryDef("q65_window_misc",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        table(s, d, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderpriority"), col("o_orderkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            lead(col("o_orderkey"), 1, -1L).over(w).as("next_key"),
            first_value(col("o_orderkey")).over(w).as("top_key"),
            percent_rank().over(w).as("pct"))
          .filter(col("rnk") <= 5)
          .orderBy("o_orderpriority", "rnk")
      },
      Some("""SELECT o_orderpriority, o_orderkey, rnk, drnk, next_key, top_key, pct
              FROM (SELECT o_orderpriority, o_orderkey,
                      RANK() OVER w AS rnk,
                      DENSE_RANK() OVER w AS drnk,
                      COALESCE(LEAD(o_orderkey, 1) OVER w, -1) AS next_key,
                      FIRST_VALUE(o_orderkey) OVER w AS top_key,
                      PERCENT_RANK() OVER w AS pct
                    FROM orders WHERE o_orderstatus = 'F'
                    WINDOW w AS (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice DESC, o_orderkey)) t
              WHERE rnk <= 5 ORDER BY o_orderpriority, rnk""")),

    // sketch aggregates — the 100 TB cardinality/quantile tools.
    // The raw estimates are engine-specific (Spark HLL++/KLL vs
    // DuckDB's HLL) so they cannot be hash-compared; the CONTRACT is
    // oracle-checkable: emit the exact value plus an est_within_bound
    // boolean (|est - exact| inside the algorithm's error budget,
    // computed Spark-side), and the oracle reproduces the exact value
    // and asserts TRUE. SketchSpec additionally probes the raw
    // estimates' accuracy against exact at several scales.
    // Dedup-first shape, deliberately NOT
    // `agg(approx_count_distinct, countDistinct)`: mixing a distinct
    // agg with HLL makes Spark's rewrite key the HLL partial by
    // (flag, orderkey) — one 408-long sketch buffer PER DISTINCT KEY
    // shuffled across the wire (~500 MB at sf0.1, unbounded at 100 TB).
    // Deduping the pair first keeps sketch state per final group only,
    // and HLL is duplicate-insensitive so the estimate is identical;
    // count over the deduped set IS the exact distinct count. Bound:
    // rsd 0.02 → 5% is 2.5σ; HLL++ on fixed data is deterministic and
    // SketchSpec pins the observed error well inside it.
    QueryDef("q66_sketch_distinct",
      (s, d) => table(s, d, "lineitem")
        .select("l_returnflag", "l_orderkey").distinct()
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
          count(lit(1)).as("exact_orders"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx_orders") - col("exact_orders")).cast(DoubleType)
            <= col("exact_orders").cast(DoubleType) * 0.05).as("est_within_bound"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
                     TRUE AS est_within_bound
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // percentile_approx(accuracy=1000) guarantees rank error <= n/1000;
    // the exact p45/p55 window allows 50x that slack, so the boolean
    // is true by the algorithm's published contract, not by luck. The
    // exact median itself interpolates identically to DuckDB's
    // PERCENTILE_CONT (parity proven by q176) and is hash-verified.
    QueryDef("q67_sketch_quantiles",
      (s, d) => table(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx_median"),
          expr("percentile(o_totalprice, array(0.45, 0.5, 0.55))").as("pw"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        .select(col("o_orderpriority"), col("pw")(1).as("exact_median"),
          col("lo"), col("hi"),
          (col("approx_median") >= col("pw")(0) &&
            col("approx_median") <= col("pw")(2)).as("est_within_bound"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                     PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                       AS exact_median,
                     MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
                     TRUE AS est_within_bound
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // outer-join family: per-customer order stats keeping order-less
    // customers (LEFT OUTER), null-aware aggregation on the outer side
    QueryDef("q68_outer_join",
      (s, d) => table(s, d, "customer")
        .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
        .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
                COALESCE(${DSUM("o_totalprice")}, 0.0) AS total_spend
              FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey ORDER BY c_custkey""")),

    // edit distance between each doc's opening and the next doc's
    // (Levenshtein — the char-level near-dup verifier; integer output)
    QueryDef("q69_edit_distance",
      (s, d) => {
        val docs = table(s, d, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 30).as("head30"))
        val next = docs.select((col("doc_id") - 1).as("doc_id"), col("head30").as("next_head"))
        docs.join(next, "doc_id")
          .select(col("doc_id"), levenshtein(col("head30"), col("next_head")).as("edit_dist"))
          .orderBy("doc_id")
      },
      Some("""SELECT a.doc_id, levenshtein(substring(a.text, 1, 30), substring(b.text, 1, 30)) AS edit_dist
              FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
              ORDER BY a.doc_id""")),

    // temporal extraction: orders per (year, quarter) with weekend share
    QueryDef("q70_date_parts",
      (s, d) => table(s, d, "orders")
        .select(
          year(col("o_orderdate")).cast(LongType).as("y"), // DuckDB EXTRACT → BIGINT
          quarter(col("o_orderdate")).cast(LongType).as("q"),
          when(dayofweek(col("o_orderdate")).isin(1, 7), 1L).otherwise(0L).as("is_weekend"))
        .groupBy("y", "q")
        .agg(count(lit(1)).as("n"), sum(col("is_weekend")).as("n_weekend"))
        .orderBy("y", "q"),
      Some("""SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
                EXTRACT(QUARTER FROM o_orderdate) AS q,
                COUNT(*) AS n,
                CAST(SUM(CASE WHEN EXTRACT(DOW FROM o_orderdate) IN (0, 6)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend
              FROM orders GROUP BY y, q ORDER BY y, q""")),

    // per-label embedding centroids (posexplode → decimal mean per dim);
    // only the first 4 dims in the output to keep the result compact
    QueryDef("q59_embed_centroids",
      (s, d) => table(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
        .filter(col("p") < 4)
        .select(col("label"), col("p").cast(LongType).as("pos"), col("v"))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"),
          (dsum8(col("v").cast(DoubleType)) / count(lit(1))).as("centroid"))
        .orderBy("label", "pos"),
      Some(s"""SELECT label, i AS pos, COUNT(*) AS n,
                ${DSUM8("CAST(embedding[i + 1] AS DOUBLE)")} / COUNT(*) AS centroid
              FROM (SELECT label, embedding, unnest(range(len(embedding))) AS i
                    FROM embeddings) t
              WHERE i < 4
              GROUP BY label, i ORDER BY label, pos"""))
  )
}
