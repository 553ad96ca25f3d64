package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cast.Casts
import QueryDef.table

/** The relational operator suite over the TPC-H-ish testdata — one
  * named query per operator family from SURVEY.md §2, each with an
  * equivalent DuckDB oracle.
  *
  * Cross-engine determinism rules used throughout:
  *  - every query has a total ORDER BY;
  *  - SUMs of doubles go through DECIMAL(18,4) (exact, associative —
  *    immune to partial-aggregation order) and come back as DOUBLE;
  *  - integer SUMs are cast to BIGINT in the oracle (DuckDB widens to
  *    HUGEINT, Spark to BIGINT);
  *  - rollup NULL ordering is pinned NULLS FIRST (Spark's ASC default).
  */
object Relational {

  /** Order-insensitive exact double sum: decimal-accumulate, emit double.
    *
    * NO double-space `round()` on top of these: Spark rounds the
    * shortest-decimal repr (BigDecimal HALF_UP) while DuckDB rounds the
    * binary value, so money sums landing on exact `.xx45` diverge. The
    * decimal→double cast itself is bit-identical in both engines, and
    * quotient `exact_double / count` is IEEE-identical too — so emit
    * those directly, unrounded.
    */
  import Money.{dsum, DSUM}

  val all: Seq[QueryDef] = Seq(

    // P1/P2 — projection / column pruning straight off the scan
    QueryDef("q01_scan_project",
      (s, d) => table(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // (l_orderkey, l_linenumber) is not unique in the synthetic data;
        // order by every output column for a total, engine-portable order
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""")),

    // P3 — rename map (unmatched keys are no-ops)
    QueryDef("q02_rename",
      (s, d) => Casts.renameColumns(table(s, d, "customer"),
          Map("c_custkey" -> "cust_id", "c_name" -> "nome", "c_acctbal" -> "saldo",
              "no_such_col" -> "ignored"))
        .select("cust_id", "nome", "saldo")
        .orderBy("cust_id"),
      Some("""SELECT c_custkey AS cust_id, c_name AS nome, c_acctbal AS saldo
              FROM customer ORDER BY c_custkey""")),

    // P4 — equality filter
    QueryDef("q03_filter_eq",
      (s, d) => table(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
              WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""")),

    // range + conjunctive predicates, pushed to the parquet scan
    QueryDef("q04_filter_range",
      (s, d) => table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz")
          && col("l_discount").between(0.05, 0.07))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
                AND l_discount BETWEEN 0.05 AND 0.07
              ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""")),

    // F1 — lenient int cast ("12.0" → 12, garbage → NULL, non-integral
    // "x.7" → NULL: pandas raises on the unsafe float→Int64 cast, the
    // per-value coerce analogue is NULL — never a silent truncation)
    QueryDef("q05_cast_int",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          Casts.toLongLenient(concat(col("n_chars").cast(StringType), lit(".0"))).as("as_int"),
          Casts.toLongLenient(concat(col("n_chars").cast(StringType), lit(".7"))).as("frac_int"),
          Casts.toLongLenient(lit("not-a-number")).as("bad_int"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CASE WHEN FLOOR(TRY_CAST(CAST(n_chars AS VARCHAR) || '.0' AS DOUBLE))
                          = TRY_CAST(CAST(n_chars AS VARCHAR) || '.0' AS DOUBLE)
                     THEN TRY_CAST(TRY_CAST(CAST(n_chars AS VARCHAR) || '.0' AS DOUBLE) AS BIGINT)
                END AS as_int,
                CASE WHEN FLOOR(TRY_CAST(CAST(n_chars AS VARCHAR) || '.7' AS DOUBLE))
                          = TRY_CAST(CAST(n_chars AS VARCHAR) || '.7' AS DOUBLE)
                     THEN TRY_CAST(TRY_CAST(CAST(n_chars AS VARCHAR) || '.7' AS DOUBLE) AS BIGINT)
                END AS frac_int,
                TRY_CAST(TRY_CAST('not-a-number' AS DOUBLE) AS BIGINT) AS bad_int
              FROM documents ORDER BY doc_id""")),

    // F3 — Brazilian-locale float parse (thousands dot stripped BEFORE comma swap)
    QueryDef("q06_cast_float_pt",
      (s, d) => {
        val ev = table(s, d, "events")
        // fraction digits: round BEFORE the long cast — Spark's
        // double→long cast truncates while DuckDB's rounds, so the cast
        // must always see an already-integral value
        val frac = lpad(round((col("value") - floor(col("value"))) * 100, 0)
          .cast(LongType).cast(StringType), 2, "0")
        val pt = concat(floor(col("value")).cast(LongType).cast(StringType), lit(","), frac)
        val ptThousands = concat(lit("1.234,"), frac)
        ev.select(col("event_id"),
            Casts.toDoublePt(pt).as("parsed"),
            Casts.toDoublePt(ptThousands).as("parsed_thousands"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
                TRY_CAST(REPLACE(REPLACE(
                  CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR) || ',' ||
                  LPAD(CAST(CAST(ROUND((value - FLOOR(value)) * 100, 0) AS BIGINT) AS VARCHAR), 2, '0'),
                  '.', ''), ',', '.') AS DOUBLE) AS parsed,
                TRY_CAST(REPLACE(REPLACE(
                  '1.234,' ||
                  LPAD(CAST(CAST(ROUND((value - FLOOR(value)) * 100, 0) AS BIGINT) AS VARCHAR), 2, '0'),
                  '.', ''), ',', '.') AS DOUBLE) AS parsed_thousands
              FROM events ORDER BY event_id""")),

    // F2 — trim + strip surrounding quotes
    QueryDef("q07_cast_str",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          Casts.toCleanString(concat(lit("  \""), col("lang"), lit("\" "))).as("cleaned"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                REGEXP_REPLACE(TRIM('  "' || lang || '" '), '^"|"$', '', 'g') AS cleaned
              FROM documents ORDER BY doc_id""")),

    // O1/O3 — global sort + limit → TakeOrderedAndProject
    QueryDef("q08_topk",
      (s, d) => table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("total"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice AS total
              FROM orders ORDER BY total DESC, o_orderkey LIMIT 10""")),

    // P4+P7 — the reference's users→posts pattern: name lookup drives a
    // semi-join (broadcast of the one matching dimension row)
    QueryDef("q09_scalar_lookup",
      (s, d) => {
        val cust = table(s, d, "customer").filter(col("c_name") === "Customer#000000042")
        table(s, d, "orders")
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice").as("total"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice AS total
              FROM orders WHERE o_custkey IN
                (SELECT c_custkey FROM customer WHERE c_name = 'Customer#000000042')
              ORDER BY o_orderkey""")),

    // left-semi join + aggregation
    QueryDef("q10_semi_join",
      (s, d) => {
        val urgent = table(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("l_orderkey"))
        table(s, d, "lineitem")
          .join(urgent, Seq("l_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
              FROM lineitem WHERE l_orderkey IN
                (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // left-anti join
    QueryDef("q11_anti_join",
      (s, d) => table(s, d, "customer")
        .join(table(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    // A1 — count
    QueryDef("q12_count",
      (s, d) => table(s, d, "lineitem").agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM lineitem")),

    // A2 — manifest-style one-pass stats: row count + null counts in ONE aggregate
    QueryDef("q13_manifest_stats",
      (s, d) => table(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_ship"),
        sum(when(nullif(col("l_returnflag"), lit("A")).isNull, 1L).otherwise(0L)).as("null_flag_a")),
      Some("""SELECT COUNT(*) AS n_rows,
                CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
                CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ship,
                CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'A') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_flag_a
              FROM lineitem""")),

    // distinct
    QueryDef("q14_distinct",
      (s, d) => table(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus""")),

    // set ops — union (distinct)
    QueryDef("q15_union",
      (s, d) => table(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(table(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
              UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""")),

    QueryDef("q16_intersect",
      (s, d) => table(s, d, "customer").select("c_custkey")
        .intersect(table(s, d, "orders").select("o_custkey"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders
              ORDER BY c_custkey""")),

    QueryDef("q17_except",
      (s, d) => table(s, d, "customer").select("c_custkey")
        .except(table(s, d, "orders").select("o_custkey"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders
              ORDER BY c_custkey""")),

    // the flagship group-by aggregate (TPC-H Q1 shape)
    QueryDef("q18_q1_agg",
      (s, d) => table(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
                ${DSUM("l_quantity")} AS sum_qty,
                ${DSUM("l_extendedprice")} AS sum_base,
                ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
                ${DSUM("l_quantity")} / COUNT(*) AS avg_qty,
                ${DSUM("l_discount")} / COUNT(*) AS avg_disc,
                COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // 3-table join + agg + top-k (TPC-H Q3 shape)
    QueryDef("q19_join_agg",
      (s, d) => {
        val cust = table(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val orders = table(s, d, "orders")
        val li = table(s, d, "lineitem")
        li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy("l_orderkey")
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // broadcast join against the small dimension
    QueryDef("q20_broadcast_join",
      (s, d) => table(s, d, "lineitem")
        .join(broadcast(table(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand"),
      Some(s"""SELECT p_brand, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY p_brand ORDER BY p_brand""")),

    // window: latest-row-per-key (dedup-rank pattern)
    QueryDef("q21_window_latest",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        table(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast(DateType).as("last_order_date"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_order_date
              FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                      ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                    FROM orders) t
              WHERE rn = 1 ORDER BY o_custkey""")),

    // window: running sum (frame-based aggregation)
    QueryDef("q22_window_running",
      (s, d) => {
        // duplicate lineitem keys exist: rows can share the whole
        // (shipdate, orderkey, linenumber) prefix with DIFFERENT
        // prices, and a ROWS frame pairs ties in engine order. The
        // ordering therefore includes the summed operands — rows
        // still tied contribute identical amounts, so every tie
        // order yields the same running values.
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_discount"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast(DecimalType(18, 4))).over(w).cast(DoubleType).as("running_rev"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_rev")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
                  OVER (PARTITION BY l_suppkey
                        ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                 l_extendedprice, l_discount
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
              FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, running_rev""")),

    // window: top-k per group
    QueryDef("q23_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        table(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
            col("o_totalprice").as("total"))
          .orderBy("o_orderpriority", "rn")
      },
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice AS total
              FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                      ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
                    FROM orders) t
              WHERE rn <= 3 ORDER BY o_orderpriority, rn""")),

    // rollup (grouping-sets family)
    QueryDef("q24_rollup",
      (s, d) => table(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                ${DSUM("l_quantity")} AS sum_qty
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // tumbling time window over the event stream (batch form)
    QueryDef("q25_events_hourly",
      (s, d) => table(s, d, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("hour", "event_type"),
      Some(s"""SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
                COUNT(*) AS n, ${DSUM("value")} AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // semi-structured extraction from the JSON props column
    QueryDef("q26_events_json",
      (s, d) => table(s, d, "events")
        .select((regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
          .try_cast(LongType) % 10).as("k_mod"), col("value"))
        .groupBy("k_mod")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("k_mod"),
      Some(s"""SELECT TRY_CAST(REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1) AS BIGINT) % 10 AS k_mod,
                COUNT(*) AS n, ${DSUM("value")} AS sum_value
              FROM events GROUP BY 1 ORDER BY k_mod""")),

    // sessionization: 30-minute inactivity gap (lag + running flag sum)
    QueryDef("q27_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val lagTs = lag(col("ts"), 1).over(byUser)
        val flag = when(col("ts") - lagTs > expr("INTERVAL '30' MINUTE"), 1L).otherwise(0L)
        table(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), flag.as("flag"))
          .withColumn("session_id",
            sum(col("flag")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH x AS (
                SELECT user_id, event_id, ts,
                  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS flag
                FROM events),
              s AS (
                SELECT user_id, event_id, ts,
                  CAST(SUM(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
                FROM x)
              SELECT user_id, session_id, COUNT(*) AS n_events,
                STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
              FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""")),

    // manual pivot (conditional aggregation)
    QueryDef("q28_pivot",
      (s, d) => table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("l_linestatus") === "O", 1L).otherwise(0L)).as("n_o"),
          count(lit(1)).as("n_total"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
                COUNT(*) AS n_total
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // star-schema join across 4 tables with broadcast dimensions
    QueryDef("q29_star_join",
      (s, d) => {
        val nation = broadcast(table(s, d, "nation"))
        val cust = table(s, d, "customer")
        val orders = table(s, d, "orders")
        val li = table(s, d, "lineitem")
        li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(nation, col("c_nationkey") === col("n_nationkey"))
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
                JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name"""))
  )
}
