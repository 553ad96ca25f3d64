package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table
import Money.{cents, CENTS, BSUM}

/** Round-8 batch: semantic (embedding-space) dedup, and the five
  * TPC-H query shapes that completed the full 22-shape sweep (Q1, Q5,
  * Q14, Q16, Q22 — joining the 17 shapes landed in earlier rounds).
  * Same determinism discipline as Extras23: money through exact
  * integer cents or the shared decimal accumulators, ratios as ONE
  * double expression over exact integers, every query ends in a
  * total ORDER BY.
  */
object Extras27 {

  private def ts(s: String) = lit(s).cast(TimestampType)

  val all: Seq[QueryDef] = Seq(

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    // near-dup removal in embedding space — cluster with the coarse
    // quantizer, compare pairs ONLY within a cluster, drop the
    // higher-id member of every pair above the cosine threshold. The
    // clustering bounds the pair space (the whole point at 100 TB:
    // k cells ~ sqrt(corpus) makes within-cell pairs near-linear),
    // and the per-cell summary is exact: every assignment and cosine
    // is recomputed by the oracle. τ = 0.35 is calibrated to this
    // synthetic corpus (within-cell cosine p99 ≈ 0.32) — real
    // deployments use ~0.95+ on purpose-trained embeddings.
    //
    // k is DERIVED as ceil(sqrt(corpus count)) — the SemDeDup sizing
    // rule applied, not just documented: per-cell membership stays
    // ~sqrt(n), so within-cell pairs grow ~n^1.5 instead of the n²/8
    // a pinned 8-cell quantizer gave (round-9 64× probe: 31 s).
    // sqrt/ceil on a <2^53 integer are correctly-rounded IEEE ops —
    // bit-identical in the JVM and DuckDB.
    // REGIME NOTE: this is SemDeDup's exact AUDIT form — within-cell
    // all-pairs, ~n^1.5 at k ~ sqrt(n). Production callers go through
    // Dedup.semanticDup, which routes to this form only under
    // Dedup.ExactRegimeMaxRows and flips to the linear
    // representative-pruned form (q304's shape) beyond it; q311/q312
    // gate the router on both sides of the threshold.
    QueryDef("q273_semantic_dedup",
      (s, d) => {
        val fv = table(s, d, "embeddings").select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        val k = math.max(8L,
          math.ceil(math.sqrt(fv.count().toDouble)).toLong)
        val cc = fv.filter(col("vec_id") < k)
          .select(col("vec_id").as("cell"), col("v").as("cv"))
        // ONE n×k assignment pass, pinned — the cell census and the
        // pair stage both read it (recomputing it doubled the 64×
        // cost: at k ~ sqrt(n) assignment is half the operator)
        val asg = graft.ops.Dedup.assignCells(fv, cc, "vec_id", "v")
          .transform(graft.ops.Pinned.pin)
        // NO pin on the pair frame: since the per-cell stats folded
        // into ONE aggregate (count + distinct drop in a single
        // groupBy), the pair lineage has exactly one consumer — a
        // single-consumer checkpoint is a pure scheduler barrier
        // (q272 precedent). The expensive assignment stays pinned
        // above (two consumers: pair stage + cell census).
        val pairs = graft.ops.Dedup
          .semanticDupPairsFromAssignment(fv, asg, "vec_id", "v", tau = 0.35)
        // ONE aggregate carries both per-cell stats (count + distinct
        // drop count) — the old two-groupBy + two-join shape paid an
        // extra exchange and an extra join's job boundaries for
        // values computable in a single pass over the pairs
        val stats = pairs.groupBy("cell").agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("j2")).as("n_dropped"))
        asg.groupBy("cell").agg(count(lit(1)).as("n_docs"))
          .join(stats, Seq("cell"), "left")
          .na.fill(0L, Seq("n_pairs", "n_dropped"))
          .select(col("cell"), col("n_docs"), col("n_pairs"), col("n_dropped"),
            (col("n_docs") - col("n_dropped")).as("n_kept"))
          .orderBy("cell")
      },
      Some("""WITH emb AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
              cc AS (SELECT vec_id AS cell, v AS cv FROM emb
                     WHERE vec_id < (SELECT GREATEST(8,
                         CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))
                       FROM embeddings)),
              asg AS (SELECT vec_id, cell FROM (
                  SELECT e.vec_id, cc.cell, ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, cc.cv), cc.cell) AS rn
                  FROM emb e JOIN cc ON TRUE) WHERE rn = 1),
              pairs AS (
                SELECT a.cell, a.vec_id AS i, b.vec_id AS j2
                FROM asg a JOIN asg b
                  ON a.cell = b.cell AND a.vec_id < b.vec_id
                JOIN emb e1 ON e1.vec_id = a.vec_id
                JOIN emb e2 ON e2.vec_id = b.vec_id
                WHERE list_cosine_similarity(e1.v, e2.v) >= 0.35),
              np AS (SELECT cell, COUNT(*) AS n_pairs FROM pairs GROUP BY 1),
              nd AS (SELECT cell, COUNT(*) AS n_dropped FROM (
                       SELECT DISTINCT cell, j2 FROM pairs) GROUP BY 1),
              docs AS (SELECT cell, COUNT(*) AS n_docs FROM asg GROUP BY 1)
              SELECT d.cell, d.n_docs,
                     COALESCE(np.n_pairs, 0) AS n_pairs,
                     COALESCE(nd.n_dropped, 0) AS n_dropped,
                     d.n_docs - COALESCE(nd.n_dropped, 0) AS n_kept
              FROM docs d LEFT JOIN np ON np.cell = d.cell
              LEFT JOIN nd ON nd.cell = d.cell
              ORDER BY d.cell""")),

    // ---- TPC-H Q5: local-supplier volume. --------------------------
    // Revenue from 1996 orders where the supplier and the customer
    // share a nation, per ASIA nation. The classic 6-table join cycle;
    // the c_nationkey = s_nationkey equality closes it. All dims
    // broadcast; lineitem→orders is the only fact-fact shuffle.
    QueryDef("q274_tpch_q5",
      (s, d) => {
        val asiaNat = broadcast(table(s, d, "nation")
          .join(table(s, d, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
        val cust = broadcast(table(s, d, "customer")
          .join(asiaNat, col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey", "c_nationkey"))
        val supp = broadcast(table(s, d, "supplier")
          .join(asiaNat, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name")))
        table(s, d, "lineitem")
          .join(table(s, d, "orders")
              .filter(col("o_orderdate") >= ts("1996-01-01") &&
                col("o_orderdate") < ts("1997-01-01"))
              .select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("revenue_c"), count(lit(1)).as("n_lines"))
          .orderBy(col("revenue_c").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
                ${BSUM(CENTS("l_extendedprice * (1.0 - l_discount)"))} AS revenue_c,
                COUNT(*) AS n_lines
              FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN supplier ON l_suppkey = s_suppkey
                               AND c_nationkey = s_nationkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
              GROUP BY 1
              ORDER BY revenue_c DESC, n_name""")),

    // ---- TPC-H Q14: promotion effect (conditional ratio). ----------
    // Share of September-1997 revenue from PROMO parts: two exact
    // cent sums out of ONE conditional aggregate over the month's
    // lines, one double division scaled to percent. Part dim
    // broadcasts; the scan prunes on the shipdate band.
    QueryDef("q275_tpch_q14",
      (s, d) => {
        val vol = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1997-09-01") &&
            col("l_shipdate") < ts("1997-10-01"))
          .join(broadcast(table(s, d, "part").select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg(sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0L)))
              .as("promo_c"),
            sum(vol).as("total_c"))
          .withColumn("promo_pct",
            lit(100.0) * col("promo_c").cast(DoubleType) /
              col("total_c").cast(DoubleType))
      },
      Some(s"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN ${CENTS("l_extendedprice * (1.0 - l_discount)")}
                         ELSE 0 END) AS BIGINT) AS promo_c,
                ${BSUM(CENTS("l_extendedprice * (1.0 - l_discount)"))} AS total_c,
                100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN ${CENTS("l_extendedprice * (1.0 - l_discount)")}
                         ELSE 0 END) AS DOUBLE)
                  / CAST(SUM(${CENTS("l_extendedprice * (1.0 - l_discount)")}) AS DOUBLE)
                  AS promo_pct
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1997-09-01'
                AND l_shipdate < TIMESTAMP '1997-10-01'""")),

    // ---- TPC-H Q16: parts/supplier relationship count. -------------
    // Distinct suppliers per (brand, type, size) over the lineitem
    // bridge (no partsupp in the synthetic schema), excluding one
    // brand, one type, a size whitelist, and "complaint" suppliers
    // (adapted: negative account balance) via NOT IN → a broadcast
    // left-anti join, never a correlated re-scan. COUNT(DISTINCT)
    // shuffles the already-small (brand,type,size,supp) projection.
    QueryDef("q276_tpch_q16",
      (s, d) => {
        val badSupp = broadcast(table(s, d, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey"))
        val p = broadcast(table(s, d, "part")
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14))
          .select("p_partkey", "p_brand", "p_type", "p_size"))
        table(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(p, col("l_partkey") === col("p_partkey"))
          .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
                     CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
                AND p_size IN (1, 4, 9, 14)
                AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
              GROUP BY 1, 2, 3
              ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // ---- TPC-H Q22: global sales opportunity. ----------------------
    // Customers above the positive-balance average with no RECENT
    // (1998+) orders, per country code (adapted: nationkey mod 5,
    // codes 0-3 selected — the phone-prefix analog; the recency
    // window replaces "no orders ever", which is empty on this
    // synthetic corpus where every customer has ordered). The average
    // test is EXACT integer cross-multiplication (bal_c · N > S), the
    // no-recent-orders test a broadcast-anti join; the global (S, N)
    // scalar is a one-row cross join. No correlated subquery
    // re-execution anywhere.
    QueryDef("q277_tpch_q22",
      (s, d) => {
        val cust = table(s, d, "customer")
          .withColumn("cntry", pmod(col("c_nationkey"), lit(5)))
          .filter(col("cntry").isin(0, 1, 2, 3))
          .withColumn("bal_c", cents(col("c_acctbal")))
        val avgRef = cust.filter(col("bal_c") > 0L)
          .agg(sum(col("bal_c")).as("s_c"), count(lit(1)).as("n_c"))
        cust.crossJoin(broadcast(avgRef))
          .filter(col("bal_c") * col("n_c") > col("s_c"))
          .join(table(s, d, "orders")
              .filter(col("o_orderdate") >= ts("1998-01-01"))
              .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("cntry")
          .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
          .orderBy("cntry")
      },
      Some(s"""WITH c AS (SELECT c_custkey, c_nationkey % 5 AS cntry,
                       ${CENTS("c_acctbal")} AS bal_c
                   FROM customer WHERE c_nationkey % 5 IN (0, 1, 2, 3)),
              ref AS (SELECT CAST(SUM(bal_c) AS BIGINT) AS s_c,
                             COUNT(*) AS n_c
                      FROM c WHERE bal_c > 0)
              SELECT cntry, COUNT(*) AS numcust,
                     CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
              FROM c, ref
              WHERE bal_c * n_c > s_c
                AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01')
              GROUP BY 1 ORDER BY cntry""")),

    // GENERATED columns under the oracle gate: the table declares
    // `bal_band GENERATED ALWAYS AS (abs(bal_c) div 100000)` at
    // CREATE (a `graft.generated.*` property + derived CHECK); the
    // first append OMITS the column (the writer computes it before
    // staging), the second PROVIDES a consistent value (the derived
    // constraint validates it). The read-back per-band fingerprint is
    // recomputed by the oracle straight from `customer` — the hash
    // proves the write-side generation produced exactly the declared
    // expression on every row of both paths. abs() keeps the operand
    // non-negative so Spark's truncating `div` and DuckDB's flooring
    // `//` agree.
    QueryDef("q280_generated_columns",
      (s, d) => {
        import graft.sink.TxLogTable
        val t = QueryDef.scratch("graft_gen_q")
          .resolve("t").toString
        TxLogTable.create(s, t, StructType(Seq(
          StructField("k", LongType), StructField("bal_c", LongType),
          StructField("bal_band", LongType))),
          Map(TxLogTable.GeneratedPropPrefix + "bal_band" ->
            "abs(bal_c) div 100000"))
        val cust = table(s, d, "customer").select(
          col("c_custkey").as("k"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        TxLogTable.append(cust.filter(col("k") % 2 === 0), t) // omitted → computed
        TxLogTable.append(cust.filter(col("k") % 2 === 1)      // provided → validated
          .withColumn("bal_band", expr("abs(bal_c) div 100000")), t)
        TxLogTable.read(s, t)
          .groupBy("bal_band")
          .agg(count(lit(1)).as("n_rows"), sum(col("bal_c")).as("bal_sum"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy("bal_band")
      },
      Some("""WITH c AS (SELECT c_custkey AS k,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal
                   FROM customer)
              SELECT abs(bal) // 100000 AS bal_band,
                     COUNT(*) AS n_rows,
                     CAST(SUM(bal) AS BIGINT) AS bal_sum,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM c GROUP BY 1 ORDER BY bal_band""")),

    // Temperature-scaled mixture weights (α = 0.5): the standard
    // multilingual/source re-balancing rule w_s ∝ p_s^α that every
    // large-scale pretraining mixture applies to up-sample the tail
    // (mT5 §3.1 / XLM-R style). EVERYTHING is 64-bit integer
    // arithmetic: per-source token counts are exact sums; sqrt goes
    // through the integer square root (floor of the correctly-rounded
    // IEEE sqrt of an integer-valued double — bit-identical in both
    // engines); shares, weights, the up/down-sampling boost and the
    // expected token allocation at a 1M budget are all integer
    // divisions of those. No cross-source double summation exists
    // anywhere, so partial aggregation and AQE reorder freely. One
    // tokenize pass, one 20-row rollup — map-only at any corpus size.
    QueryDef("q279_mixture_temperature",
      (s, d) => {
        val perSrc = table(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast(LongType)).as("n_tok"))
          .withColumn("isq",
            floor(sqrt(col("n_tok").cast(DoubleType))).cast(LongType))
        val tot = perSrc.agg(sum(col("n_tok")).as("t_tok"),
          sum(col("isq")).as("t_isq"))
        perSrc.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_tok"),
            expr("n_tok * 10000 div t_tok").as("share_bp"),
            expr("isq * 10000 div t_isq").as("w_bp"),
            expr("(isq * 10000 div t_isq) * 10000 div " +
              "greatest(n_tok * 10000 div t_tok, 1)").as("boost_bp"),
            expr("1000000 * isq div t_isq").as("budget_tokens"))
          .orderBy("source")
      },
      Some(s"""WITH p AS (
                SELECT source, COUNT(*) AS n_docs,
                       ${BSUM("CAST(len(string_split(text, ' ')) AS BIGINT)")}
                         AS n_tok
                FROM documents GROUP BY source),
              q AS (SELECT source, n_docs, n_tok,
                       CAST(floor(sqrt(CAST(n_tok AS DOUBLE))) AS BIGINT) AS isq
                    FROM p),
              t AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS t_tok,
                           CAST(SUM(isq) AS BIGINT) AS t_isq FROM q)
              SELECT source, n_docs, n_tok,
                     n_tok * 10000 // t_tok AS share_bp,
                     isq * 10000 // t_isq AS w_bp,
                     (isq * 10000 // t_isq) * 10000
                       // greatest(n_tok * 10000 // t_tok, 1) AS boost_bp,
                     1000000 * isq // t_isq AS budget_tokens
              FROM q CROSS JOIN t ORDER BY source""")),

    // ---- TPC-H Q1: pricing summary report. -------------------------
    // THE scan-heavy aggregate: one pass over the date-bounded fact,
    // eight aggregates per (returnflag, linestatus) — 6 groups. Every
    // sum is exact (BIGINT quantities, floored cents, discount
    // percentage points); the averages are single double divisions of
    // those exact integers, so partial aggregation and AQE can
    // reorder freely. Map-side combine collapses the scan to 6 rows
    // per task before the one tiny shuffle.
    QueryDef("q278_tpch_q1",
      (s, d) => {
        val qtyI = col("l_quantity").cast(LongType)
        table(s, d, "lineitem")
          .filter(col("l_shipdate") <= ts("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(qtyI).as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("sum_base_c"),
            sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("sum_disc_c"),
            sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
              (lit(1.0) + col("l_tax")))).as("sum_charge_c"),
            sum(floor(col("l_discount") * lit(100.0)).cast(LongType))
              .as("sum_disc_pp"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty",
            col("sum_qty").cast(DoubleType) / col("count_order").cast(DoubleType))
          .withColumn("avg_price_c",
            col("sum_base_c").cast(DoubleType) / col("count_order").cast(DoubleType))
          .withColumn("avg_disc_pp",
            col("sum_disc_pp").cast(DoubleType) / col("count_order").cast(DoubleType))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
                ${BSUM("CAST(l_quantity AS BIGINT)")} AS sum_qty,
                ${BSUM(CENTS("l_extendedprice"))} AS sum_base_c,
                ${BSUM(CENTS("l_extendedprice * (1.0 - l_discount)"))} AS sum_disc_c,
                ${BSUM(CENTS("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)"))} AS sum_charge_c,
                ${BSUM("CAST(floor(l_discount * 100.0) AS BIGINT)")} AS sum_disc_pp,
                COUNT(*) AS count_order,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
                CAST(SUM(${CENTS("l_extendedprice")}) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS avg_price_c,
                CAST(SUM(CAST(floor(l_discount * 100.0) AS BIGINT)) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS avg_disc_pp
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              GROUP BY 1, 2
              ORDER BY l_returnflag, l_linestatus"""))
  )
}
