package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Round-7 batch: the twelve TPC-H query shapes not yet in the suite
  * (Q2, Q4, Q6, Q8, Q9, Q11, Q12, Q13, Q15, Q17, Q19, Q20), adapted to
  * the testdata star schema. The synthetic schema has no `partsupp`
  * table and no ship-mode / commit-date / container columns, so the
  * queries that need them are re-expressed over `lineitem` as the
  * part↔supplier bridge (the same adaptation q196/q197 already use) —
  * the PLAN SHAPES are preserved exactly: correlated-min subquery
  * (Q2), EXISTS semi-join (Q4/Q20), scan-aggregate (Q6), market-share
  * conditional ratio (Q8), multi-dim profit rollup (Q9), HAVING
  * against a global scalar (Q11), CASE pivot (Q12), outer-join count
  * distribution (Q13), view-max scalar (Q15), correlated-avg filter
  * (Q17), disjunctive broadcast predicate join (Q19).
  *
  * Determinism: every money aggregate is either per-line floored
  * integer cents summed as BIGINT, or the proven dsum decimal
  * accumulator — no double summation whose order could diverge
  * between engines. Ratio columns are ONE double division of two
  * exact integers. Every query ends in a total ORDER BY.
  *
  * Scale: dimension sides (part, supplier, nation, region, the
  * per-part aggregate in Q17, the scalar totals in Q11/Q15) broadcast;
  * every fact-side shuffle is a single hash aggregate or equi-join on
  * its natural key. Nothing here materializes more than one pass over
  * `lineitem` per query.
  */
object Extras23 {

  import Money.{dsum, DSUM, cents}

  private def ts(s: String) = lit(s).cast(TimestampType)

  val all: Seq[QueryDef] = Seq(

    // ---- TPC-H Q2: min-cost supplier (correlated MIN subquery). ----
    // partsupp is adapted as the observed offer book: per (supplier,
    // part) the minimum unit price ever transacted in lineitem. The
    // correlated subquery ("the cheapest EUROPE offer for this part")
    // becomes a window MIN per part over the region-filtered offers —
    // one fact aggregate, dims broadcast, no re-scan of the fact for
    // the subquery (Catalyst would otherwise plan a self-join; the
    // window form reads the offer book once).
    QueryDef("q247_tpch_q2",
      (s, d) => {
        val qp = broadcast(table(s, d, "part")
          .filter(col("p_type") === "PROMO" && col("p_size") <= 10)
          .select("p_partkey", "p_name"))
        val supRegion = broadcast(table(s, d, "supplier")
          .join(table(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
          .join(table(s, d, "region").filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal"))
        val offers = table(s, d, "lineitem")
          .join(qp, col("l_partkey") === col("p_partkey"))
          .groupBy("l_partkey", "l_suppkey", "p_name")
          .agg(min(floor(lit(100.0) * col("l_extendedprice") / col("l_quantity"))
            .cast(LongType)).as("unit_c"))
        val eo = offers.join(supRegion, col("l_suppkey") === col("s_suppkey"))
        eo.withColumn("best_c", min(col("unit_c")).over(
            Window.partitionBy(col("l_partkey"))))
          .filter(col("unit_c") === col("best_c"))
          .select(col("l_partkey").as("p_partkey"), col("p_name"),
            col("s_name"), col("s_acctbal"), col("unit_c"))
          .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
          .limit(100)
      },
      Some("""WITH qp AS (SELECT p_partkey, p_name FROM part
                          WHERE p_type = 'PROMO' AND p_size <= 10),
                   offer AS (
                     SELECT l_partkey, l_suppkey, p_name,
                            MIN(CAST(floor(100.0 * l_extendedprice / l_quantity) AS BIGINT)) AS unit_c
                     FROM lineitem JOIN qp ON l_partkey = p_partkey
                     GROUP BY 1, 2, 3),
                   eo AS (
                     SELECT o.*, s_name, s_acctbal
                     FROM offer o
                       JOIN supplier ON l_suppkey = s_suppkey
                       JOIN nation ON s_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
                     WHERE r_name = 'EUROPE')
              SELECT l_partkey AS p_partkey, p_name, s_name, s_acctbal, unit_c
              FROM eo
              WHERE unit_c = (SELECT MIN(unit_c) FROM eo e2
                              WHERE e2.l_partkey = eo.l_partkey)
              ORDER BY s_acctbal DESC, p_partkey, s_name
              LIMIT 100""")),

    // ---- TPC-H Q4: order-priority checking (EXISTS semi-join). ----
    // No commit/receipt dates in the schema; "late" is adapted to
    // shipped more than 60 days after order date. The EXISTS becomes
    // a left-semi join on the order key with the lateness residual —
    // the fact is scanned once, the semi-join output carries at most
    // one row per order, and the final aggregate is 5 groups.
    QueryDef("q248_tpch_q4",
      (s, d) => {
        val ords = table(s, d, "orders")
          .filter(col("o_orderdate") >= ts("1997-01-01") &&
            col("o_orderdate") < ts("1997-04-01"))
        val li = table(s, d, "lineitem").select("l_orderkey", "l_shipdate")
        ords.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1997-04-01'
                AND EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey
                              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
              GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // ---- TPC-H Q6: forecast-revenue change (pure scan-aggregate). --
    // The canonical pushdown probe: one scan, every predicate lands in
    // PushedFilters, one partial+final aggregate, zero joins. The
    // discount bounds compare the same parquet doubles in both
    // engines, so BETWEEN is exact.
    QueryDef("q249_tpch_q6",
      (s, d) =>
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1997-01-01") &&
            col("l_shipdate") < ts("1998-01-01") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
            count(lit(1)).as("n_lines")),
      Some(s"""SELECT ${DSUM("l_extendedprice * l_discount")} AS revenue,
                      COUNT(*) AS n_lines
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                 AND l_shipdate < TIMESTAMP '1998-01-01'
                 AND l_discount BETWEEN 0.05 AND 0.07
                 AND l_quantity < 24""")),

    // ---- TPC-H Q8: national market share (conditional ratio). ------
    // Share of NATION_7 suppliers in ECONOMY-part sales to AMERICA
    // customers, per order year. Numerator and denominator are exact
    // integer cents from ONE conditional aggregate over the wide join
    // (supplier nation decides the numerator flag); the share is a
    // single double division. All dims broadcast; lineitem→orders is
    // the only fact-fact shuffle.
    QueryDef("q250_tpch_q8",
      (s, d) => {
        val amCust = broadcast(table(s, d, "customer")
          .join(table(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
          .join(table(s, d, "region").filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey")))
        val ecoPart = broadcast(table(s, d, "part")
          .filter(col("p_type") === "ECONOMY").select("p_partkey"))
        val supNat = broadcast(table(s, d, "supplier")
          .join(table(s, d, "nation").withColumnRenamed("n_name", "supp_nation"),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation"))
        val vol = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        table(s, d, "lineitem")
          .join(ecoPart, col("l_partkey") === col("p_partkey"))
          .join(supNat, col("l_suppkey") === col("s_suppkey"))
          .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(amCust, col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(sum(when(col("supp_nation") === "NATION_7", vol)
              .otherwise(lit(0L))).as("nation_c"),
            sum(vol).as("total_c"))
          .withColumn("mkt_share",
            col("nation_c").cast(DoubleType) / col("total_c").cast(DoubleType))
          .orderBy("o_year")
      },
      Some("""SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
                     CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
                         THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS nation_c,
                     CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS total_c,
                     CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
                         THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) /
                       CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS DOUBLE)
                       AS mkt_share
              FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
                JOIN orders ON l_orderkey = o_orderkey
              WHERE p_type = 'ECONOMY'
                AND o_custkey IN (
                  SELECT c_custkey FROM customer
                    JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                  WHERE r_name = 'AMERICA')
              GROUP BY 1 ORDER BY 1""")),

    // ---- TPC-H Q9: product-type profit rollup. ---------------------
    // partsupp's supplycost is adapted as 60% of the part's retail
    // price (a fixed per-part attribute, same spirit: cost rides the
    // part dim). Profit is floored per LINE to exact cents — negative
    // lines floor toward -inf identically in both engines — then
    // summed as BIGINT per (nation, year).
    QueryDef("q251_tpch_q9",
      (s, d) => {
        val redPart = broadcast(table(s, d, "part")
          .filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice"))
        val supNat = broadcast(table(s, d, "supplier")
          .join(table(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation")))
        val amount = floor((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")) * lit(100.0))
          .cast(LongType)
        table(s, d, "lineitem")
          .join(redPart, col("l_partkey") === col("p_partkey"))
          .join(supNat, col("l_suppkey") === col("s_suppkey"))
          .join(table(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(amount).as("profit_c"), count(lit(1)).as("n_lines"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
                     CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount)
                         - 0.6 * p_retailprice * l_quantity) * 100.0) AS BIGINT)) AS BIGINT) AS profit_c,
                     COUNT(*) AS n_lines
              FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN orders ON l_orderkey = o_orderkey
              WHERE p_name LIKE '%red%'
              GROUP BY 1, 2
              ORDER BY nation, o_year DESC""")),

    // ---- TPC-H Q11: important stock (HAVING vs global scalar). -----
    // Stock value per part is adapted to shipped quantity × retail
    // price for NATION_3 suppliers. The fraction test avoids the
    // double threshold entirely: 2000·value > total compares exact
    // integers. The grand total is a one-row broadcast joined back —
    // the per-part aggregate is computed ONCE (Catalyst reuses the
    // exchange for both consumers).
    QueryDef("q252_tpch_q11",
      (s, d) => {
        val natSup = broadcast(table(s, d, "supplier")
          .filter(col("s_nationkey") === 3).select("s_suppkey"))
        val partPrice = broadcast(table(s, d, "part")
          .select("p_partkey", "p_retailprice"))
        val value = table(s, d, "lineitem")
          .join(natSup, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .join(partPrice, col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(cents(col("l_quantity") * col("p_retailprice"))).as("value_c"))
        val total = value.agg(sum(col("value_c")).as("total_c"))
        value.crossJoin(broadcast(total))
          .filter(col("value_c") * 2000 > col("total_c"))
          .select(col("l_partkey").as("p_partkey"), col("value_c"))
          .orderBy(col("value_c").desc, col("p_partkey"))
      },
      Some("""WITH v AS (
                SELECT l_partkey,
                       CAST(SUM(CAST(floor(l_quantity * p_retailprice * 100.0) AS BIGINT)) AS BIGINT) AS value_c
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
                GROUP BY 1)
              SELECT l_partkey AS p_partkey, value_c
              FROM v
              WHERE value_c * 2000 > (SELECT SUM(value_c) FROM v)
              ORDER BY value_c DESC, p_partkey""")),

    // ---- TPC-H Q12: shipping-priority pivot (CASE aggregation). ----
    // No ship-mode column; the return flag plays the mode dimension.
    // "Late" = shipped 45+ days after order date within 1998. One
    // fact-fact equi-join, then a 3-group CASE pivot — the classic
    // conditional-aggregate shape.
    QueryDef("q253_tpch_q12",
      (s, d) => {
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1998-01-01") &&
            col("l_shipdate") < ts("1999-01-01"))
          .join(table(s, d, "orders").select("o_orderkey", "o_orderdate",
            "o_orderpriority"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 45 DAYS"))
          .groupBy(col("l_returnflag"))
          .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
                     CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                     CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                AND l_shipdate < TIMESTAMP '1999-01-01'
                AND l_shipdate >= o_orderdate + INTERVAL 45 DAY
              GROUP BY 1 ORDER BY 1""")),

    // ---- TPC-H Q13: customer order-count distribution. -------------
    // LEFT OUTER with an ON-clause filter (the comment-exclusion
    // analog: drop 4-NOT SPECIFIED orders), count per customer
    // INCLUDING zeros, then histogram the counts. Two aggregates; the
    // first shuffles on custkey, the second on the tiny count domain.
    QueryDef("q254_tpch_q13",
      (s, d) => {
        val perCust = table(s, d, "customer").select("c_custkey")
          .join(table(s, d, "orders")
              .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
              .select("o_custkey", "o_orderkey"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust.groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, COUNT(*) AS custdist
              FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
                    FROM customer LEFT OUTER JOIN orders
                      ON c_custkey = o_custkey
                     AND o_orderpriority <> '4-NOT SPECIFIED'
                    GROUP BY c_custkey)
              GROUP BY c_count
              ORDER BY custdist DESC, c_count DESC""")),

    // ---- TPC-H Q15: top supplier (view + scalar MAX). --------------
    // Quarterly revenue per supplier; winners are whoever ties the
    // global max. The revenue "view" is computed once and the scalar
    // max is a one-row broadcast back onto it, exactly the Q11
    // pattern. Cents are floored per line, so the max/equality test
    // is exact integer arithmetic in both engines.
    QueryDef("q255_tpch_q15",
      (s, d) => {
        val rev = table(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1998-01-01") &&
            col("l_shipdate") < ts("1998-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("total_c"))
        val best = rev.agg(max(col("total_c")).as("best_c"))
        rev.crossJoin(broadcast(best)).filter(col("total_c") === col("best_c"))
          .join(broadcast(table(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_c"))
          .orderBy("s_suppkey")
      },
      Some("""WITH rev AS (
                SELECT l_suppkey,
                       CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS total_c
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                  AND l_shipdate < TIMESTAMP '1998-04-01'
                GROUP BY 1)
              SELECT s_suppkey, s_name, total_c
              FROM supplier JOIN rev ON s_suppkey = l_suppkey
              WHERE total_c = (SELECT MAX(total_c) FROM rev)
              ORDER BY s_suppkey""")),

    // ---- TPC-H Q17: small-quantity-order revenue. ------------------
    // "quantity < 20% of this part's average" without a double
    // threshold: quantities are whole numbers, so the test
    // 5·qty·count(*) < sum(qty) is exact BIGINT cross-multiplication.
    // The per-part aggregate is small (one row per part) and
    // broadcast back onto the fact — Catalyst plans a broadcast hash
    // join, no fact self-shuffle.
    QueryDef("q256_tpch_q17",
      (s, d) => {
        val qtyI = col("l_quantity").cast(LongType)
        val perPart = table(s, d, "lineitem")
          .groupBy(col("l_partkey").as("pk"))
          .agg(sum(qtyI).as("sum_qty"), count(lit(1)).as("cnt"))
        val brand = broadcast(table(s, d, "part")
          .filter(col("p_brand") === "Brand#23").select("p_partkey"))
        table(s, d, "lineitem")
          .join(brand, col("l_partkey") === col("p_partkey"))
          .join(broadcast(perPart), col("l_partkey") === col("pk"))
          .filter(qtyI * 5 * col("cnt") < col("sum_qty"))
          .agg(sum(cents(col("l_extendedprice"))).as("rev_c"),
            count(lit(1)).as("n_lines"))
      },
      Some("""WITH pa AS (SELECT l_partkey AS pk,
                                 SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
                                 COUNT(*) AS cnt
                          FROM lineitem GROUP BY 1)
              SELECT CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS rev_c,
                     COUNT(*) AS n_lines
              FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN pa ON l_partkey = pk
              WHERE p_brand = 'Brand#23'
                AND CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty""")),

    // ---- TPC-H Q19: disjunctive predicate join. --------------------
    // Three (brand, size, quantity) bands OR-ed together. The part
    // side pre-filters to the union of brands and broadcasts; the OR
    // evaluates as the join residual. At 100 TB the fact scan still
    // prunes on l_quantity <= 30 (the hull of the three bands) before
    // the join.
    QueryDef("q257_tpch_q19",
      (s, d) => {
        val p = broadcast(table(s, d, "part")
          .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#3"))
          .select("p_partkey", "p_brand", "p_size"))
        val band1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)
        val band2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)
        val band3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)
        table(s, d, "lineitem")
          .filter(col("l_quantity") <= 30)
          .join(p, col("l_partkey") === col("p_partkey") && (band1 || band2 || band3))
          .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("rev_c"), count(lit(1)).as("n_lines"))
      },
      Some("""SELECT CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS rev_c,
                     COUNT(*) AS n_lines
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                     AND l_quantity BETWEEN 1 AND 11)
                 OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                     AND l_quantity BETWEEN 10 AND 20)
                 OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                     AND l_quantity BETWEEN 20 AND 30)""")),

    // ---- TPC-H Q20: potential part promotion (nested semi chain). --
    // Suppliers in ASIA who moved more than 10 units of some red part
    // in 1997. The inner aggregate (shipped qty per supplier×part)
    // feeds a semi-join against red parts, then the supplier dim is
    // semi-joined against the surviving supplier keys — two nested
    // EXISTS collapsed into two left-semi hash joins, no correlated
    // re-execution.
    QueryDef("q258_tpch_q20",
      (s, d) => {
        val shipped = table(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1997-01-01") &&
            col("l_shipdate") < ts("1998-01-01"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum(col("l_quantity").cast(LongType)).as("qty"))
          .filter(col("qty") > 10)
          .join(broadcast(table(s, d, "part")
              .filter(col("p_name").like("%red%")).select("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .select("l_suppkey").distinct()
        table(s, d, "supplier")
          .join(broadcast(table(s, d, "nation")
              .join(table(s, d, "region").filter(col("r_name") === "ASIA"),
                col("n_regionkey") === col("r_regionkey"))
              .select("n_nationkey")),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name", "s_acctbal")
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, s_acctbal
              FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
                AND EXISTS (
                  SELECT 1
                  FROM (SELECT l_suppkey, l_partkey,
                               SUM(CAST(l_quantity AS BIGINT)) AS qty
                        FROM lineitem
                        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                          AND l_shipdate < TIMESTAMP '1998-01-01'
                        GROUP BY 1, 2) sh
                    JOIN part ON sh.l_partkey = p_partkey
                  WHERE p_name LIKE '%red%' AND qty > 10
                    AND sh.l_suppkey = s_suppkey)
              ORDER BY s_suppkey""")))
}
