package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryDef.table

/** Round-4 widening, batch 8: graph 2-hop reach, TPC-H Q3 and Q10
  * composites, a contingency-table independence screen, interpolated
  * percentiles, and hybrid-retrieval rank fusion.
  *
  * Determinism: the 2-hop probe is pure integer set algebra on a
  * deterministic md5-sampled subgraph; Q3/Q10 revenue uses the proven
  * dsum decimal accumulator; contingency expectations and chi-square
  * contributions are per-cell fixed expressions over exact integer
  * marginals (no cross-cell double summation, whose order would be
  * partition-dependent); percentile interpolation and RRF are fixed
  * expressions over exact ranks.
  */
object Extras11 {

  import Money.{dsum, DSUM}

  val all: Seq[QueryDef] = Seq(

    // 2-hop reach per vertex on the part co-occurrence graph,
    // restricted to a deterministic 25% vertex sample (md5 first
    // nibble). The connectivity-QA probe: how much of the catalog is
    // reachable within two hops. The wedge join is the unavoidable
    // Σ deg² expansion — the vertex sample cuts it 64x and keeps the
    // fraction stable at any data size (hash-sampling, not top-N,
    // so the subgraph is a consistent random induced subgraph); skew
    // still lands on hub mid-vertices, which AQE splits (see
    // ScaleLayoutSpec).
    QueryDef("q172_two_hop_reach",
      (s, d) => {
        // basket-collect edge build (Graph.coOccurrenceEdges): the
        // sampled fact shuffles ONCE by order key — the old
        // pinned-distinct + self-join paid two passes over it
        val e = graft.ops.Graph.coOccurrenceEdges(
            table(s, d, "lineitem")
              .filter(substring(md5(col("l_partkey").cast(StringType)), 1, 1)
                .isin("0", "1", "2", "3")),
            "l_orderkey", "l_partkey")
          .transform(graft.ops.Pinned.pin) // both directions read it
        // sym feeds the adjacency build and the neighbor-list probe —
        // pin it once or the upstream build re-executes per consumer
        // (q130 lesson)
        val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
          .transform(graft.ops.Pinned.pin)
        // routed reach (ops/Graph.twoHopReach): adjacency-gather form
        // here — the wedge Σdeg² stays irreducible, but it moves as
        // ARRAY CELLS in ONE per-u gather instead of as individual
        // (u, w) rows shuffled twice (the row form measured 6.3 s
        // warm at sf0.1 vs 2.4 s). The row form is the ROUTE above
        // the hub-degree boundary (a gather buffer is one array AQE
        // cannot skew-split) — pass the degree census to flip;
        // basket-co-occurrence degrees are bounded by catalog
        // structure, so this graph stays on the gather side at any
        // corpus size. Bit-identity of the routes is spec-pinned
        // (GraphRoutingSpec).
        graft.ops.Graph.twoHopReach(sym)
          .select(col("u").as("part"), col("n_one_hop"), col("n_two_hop"))
          .orderBy("part")
      },
      Some("""WITH m AS (
                SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem
                WHERE substring(md5(CAST(l_partkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
              e AS (
                SELECT DISTINCT a.i AS u, b.i AS v
                FROM m a JOIN m b ON a.g = b.g AND a.i < b.i),
              sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
              two_hop AS (
                SELECT t.u, COUNT(*) AS n_two_hop FROM (
                  SELECT DISTINCT e1.u, e2.v AS w
                  FROM sym e1 JOIN sym e2 ON e1.v = e2.u
                  WHERE e1.u <> e2.v) t
                WHERE NOT EXISTS (
                  SELECT 1 FROM sym s WHERE s.u = t.u AND s.v = t.w)
                GROUP BY t.u),
              one_hop AS (SELECT u, COUNT(*) AS n_one_hop FROM sym GROUP BY u)
              SELECT o.u AS part, CAST(o.n_one_hop AS BIGINT) AS n_one_hop,
                CAST(COALESCE(t.n_two_hop, 0) AS BIGINT) AS n_two_hop
              FROM one_hop o LEFT JOIN two_hop t ON t.u = o.u
              ORDER BY part""")),

    // TPC-H Q3 (shipping-priority) composite: segment-filtered
    // customers, date-windowed orders and lineitems, revenue top-10.
    // Classic plan: broadcast the filtered customer dim, shuffle-join
    // the two facts on orderkey, TakeOrderedAndProject for the
    // limit — the sort never materializes globally.
    QueryDef("q173_tpch_q3",
      (s, d) => {
        val cust = broadcast(table(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING"))
        table(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
          .join(table(s, d, "orders")
            .filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType)),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .select(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"), col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey,
                STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
                o_orderpriority,
                ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue
              FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
              GROUP BY l_orderkey, o_orderdate, o_orderpriority
              ORDER BY revenue DESC, l_orderkey
              LIMIT 10""")),

    // contingency-table independence screen: order priority vs
    // customer segment, with per-cell expected counts and chi-square
    // contributions. Marginals are exact integers; each cell's
    // expectation and contribution is ONE fixed double expression, so
    // no cross-cell summation order exists to diverge — the chi-square
    // total is the reader's one-line fold over 25 emitted cells.
    // Shape: one fact aggregation to the 25-cell table, marginals
    // derived from it, broadcast back — the fact shuffles once.
    QueryDef("q174_contingency",
      (s, d) => {
        val joined = table(s, d, "orders")
          .join(broadcast(table(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderpriority").as("prio"), col("c_mktsegment").as("seg"))
        val cells = joined.groupBy("prio", "seg").agg(count(lit(1)).as("o"))
        val rowM = cells.groupBy("prio").agg(sum("o").as("row_n"))
        val colM = cells.groupBy("seg").agg(sum("o").as("col_n"))
        val tot = cells.agg(sum("o").as("total"))
        cells.join(broadcast(rowM), "prio")
          .join(broadcast(colM), "seg")
          .crossJoin(broadcast(tot))
          .withColumn("expected",
            col("row_n").cast(DoubleType) * col("col_n").cast(DoubleType) /
              col("total").cast(DoubleType))
          .withColumn("contrib",
            (col("o").cast(DoubleType) - col("expected")) *
              (col("o").cast(DoubleType) - col("expected")) / col("expected"))
          .select("prio", "seg", "o", "row_n", "col_n", "expected", "contrib")
          .orderBy("prio", "seg")
      },
      Some("""WITH j AS (
                SELECT o_orderpriority AS prio, c_mktsegment AS seg
                FROM orders JOIN customer ON o_custkey = c_custkey),
              cells AS (
                SELECT prio, seg, CAST(COUNT(*) AS BIGINT) AS o
                FROM j GROUP BY prio, seg),
              rm AS (SELECT prio, CAST(SUM(o) AS BIGINT) AS row_n FROM cells GROUP BY prio),
              cm AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS col_n FROM cells GROUP BY seg),
              t AS (SELECT CAST(SUM(o) AS BIGINT) AS total FROM cells),
              x AS (
                SELECT c.prio, c.seg, c.o, rm.row_n, cm.col_n,
                  CAST(rm.row_n AS DOUBLE) * CAST(cm.col_n AS DOUBLE) /
                    CAST(t.total AS DOUBLE) AS expected
                FROM cells c JOIN rm ON rm.prio = c.prio
                JOIN cm ON cm.seg = c.seg CROSS JOIN t)
              SELECT prio, seg, o, row_n, col_n, expected,
                (CAST(o AS DOUBLE) - expected) * (CAST(o AS DOUBLE) - expected)
                  / expected AS contrib
              FROM x ORDER BY prio, seg""")),

    // TPC-H Q10 (returned-item reporting): revenue lost to returns
    // per customer over a quarter, top-20. Fact-fact shuffle join on
    // orderkey with the returnflag filter pushed to the lineitem
    // scan; customer and nation broadcast; TakeOrderedAndProject
    // caps the output without a global sort.
    QueryDef("q175_tpch_q10",
      (s, d) => {
        table(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .join(table(s, d, "orders")
            .filter(col("o_orderdate") >= lit("1998-01-01").cast(TimestampType) &&
              col("o_orderdate") < lit("1998-04-01").cast(TimestampType)),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
          .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      },
      Some(s"""SELECT c_custkey, c_name,
                ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue,
                c_acctbal, n_name
              FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
              WHERE l_returnflag = 'R'
                AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
              GROUP BY c_custkey, c_name, c_acctbal, n_name
              ORDER BY revenue DESC, c_custkey
              LIMIT 20""")),

    // interpolated percentiles (percentile_cont semantics) — the
    // twin of q84's discrete selection: p50/p90 of order totalprice
    // per priority as linear interpolation between the two bracketing
    // exact ranks. Ranks come from the de-skewed range pass (Ranks),
    // so no 5-partition window exists; the bracketing rank indices,
    // fraction, and interpolation are identical IEEE expressions over
    // exact (n, rank-value) pairs in both engines.
    QueryDef("q176_percentile_cont",
      (s, d) => {
        val r = graft.ops.Ranks.groupRanked(
          table(s, d, "orders").select(col("o_orderpriority"), col("o_totalprice")),
          "o_orderpriority", "o_totalprice", Seq.empty)
        def lo(p: String) = expr(s"CAST(floor((n - 1) * $p) AS BIGINT) + 1")
        def hi(p: String) = expr(s"CAST(ceil((n - 1) * $p) AS BIGINT) + 1")
        val g = r.groupBy("o_orderpriority").agg(
          max("n").as("n_orders"),
          max(when(col("rn") === lo("0.5"), col("o_totalprice"))).as("lo50"),
          max(when(col("rn") === hi("0.5"), col("o_totalprice"))).as("hi50"),
          max(when(col("rn") === lo("0.9"), col("o_totalprice"))).as("lo90"),
          max(when(col("rn") === hi("0.9"), col("o_totalprice"))).as("hi90"))
        g.select(col("o_orderpriority"), col("n_orders"),
            (col("lo50") + (col("hi50") - col("lo50")) *
              expr("(n_orders - 1) * 0.5 - floor((n_orders - 1) * 0.5)")).as("p50_cont"),
            (col("lo90") + (col("hi90") - col("lo90")) *
              expr("(n_orders - 1) * 0.9 - floor((n_orders - 1) * 0.9)")).as("p90_cont"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH r AS (
                SELECT o_orderpriority, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice) AS rn,
                  COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
                FROM orders),
              g AS (
                SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_orders,
                  MAX(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
                           THEN o_totalprice END) AS lo50,
                  MAX(CASE WHEN rn = CAST(ceil((n - 1) * 0.5) AS BIGINT) + 1
                           THEN o_totalprice END) AS hi50,
                  MAX(CASE WHEN rn = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1
                           THEN o_totalprice END) AS lo90,
                  MAX(CASE WHEN rn = CAST(ceil((n - 1) * 0.9) AS BIGINT) + 1
                           THEN o_totalprice END) AS hi90
                FROM r GROUP BY o_orderpriority)
              SELECT o_orderpriority, n_orders,
                lo50 + (hi50 - lo50) *
                  ((n_orders - 1) * 0.5 - floor((n_orders - 1) * 0.5)) AS p50_cont,
                lo90 + (hi90 - lo90) *
                  ((n_orders - 1) * 0.9 - floor((n_orders - 1) * 0.9)) AS p90_cont
              FROM g ORDER BY o_orderpriority""")),

    // hybrid-retrieval reciprocal rank fusion: fuse a LEXICAL ranking
    // (token overlap with the query document) and a VECTOR ranking
    // (embedding cosine, the q40-proven portable kernel) via
    // RRF = Σ 1/(60 + rank) — the standard way hybrid search merges
    // BM25-style and ANN result lists without score calibration.
    // Both rankings run through the de-skewed rank pass; each doc's
    // RRF is a fixed two-term double expression over integer ranks,
    // so no float accumulation order exists. Broadcast query row,
    // one corpus scan per modality.
    QueryDef("q177_rrf_fusion",
      (s, d) => {
        val docs = table(s, d, "documents")
        val qTokens = docs.filter(col("doc_id") === 0)
          .select(array_distinct(split(col("text"), " ")).as("__qt"))
        // localCheckpoint pins the narrow (doc_id, overlap) frame so the
        // tokenizing cross-join runs ONCE — the rank pass (cache build +
        // final pass) reads the materialized rows, not the text plan
        val lexical = docs.filter(col("doc_id") =!= 0)
          .crossJoin(broadcast(qTokens))
          .select(col("doc_id"),
            size(array_intersect(array_distinct(split(col("text"), " ")),
              col("__qt"))).cast(LongType).as("overlap"))
          .transform(graft.ops.Pinned.pin)
        val emb = table(s, d, "embeddings")
        val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("__qv"))
        val vec = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
          .select(col("vec_id").as("doc_id"),
            graft.functions.VectorExprs.cosineSim(col("embedding"), col("__qv")).as("cos"))
          .transform(graft.ops.Pinned.pin)
        // ONE de-skewed rank pass for BOTH modalities: the rank
        // machinery's fixed cost (cache build, boundary sample,
        // offset rollup, final pass) is per-CALL, so ranking the two
        // lists as two GROUPS of one union halves it vs. two calls.
        // -overlap rides exactly in a double (small ints), so the
        // lexical order is unchanged; ties break by doc_id as before.
        val keyed = lexical
          .select(lit("lex").as("g"), col("doc_id"),
            (-col("overlap")).cast(DoubleType).as("key"))
          .unionByName(vec.select(lit("vec").as("g"), col("doc_id"),
            (-col("cos")).as("key")))
        val ranked = graft.ops.Ranks.groupRanked(keyed, "g", "key", Seq("doc_id"))
        // pivot instead of self-join: one consumption of the ranked
        // frame; docs missing from either list drop (inner-join
        // semantics of the old lrank⋈vrank)
        ranked.groupBy("doc_id")
          .agg(max(when(col("g") === "lex", col("rn"))).as("r_lex"),
            max(when(col("g") === "vec", col("rn"))).as("r_vec"))
          .filter(col("r_lex").isNotNull && col("r_vec").isNotNull)
          .withColumn("rrf",
            lit(1.0) / (lit(60.0) + col("r_lex").cast(DoubleType)) +
              lit(1.0) / (lit(60.0) + col("r_vec").cast(DoubleType)))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(20)
          .select("doc_id", "r_lex", "r_vec", "rrf")
      },
      Some("""WITH qt AS (
                SELECT list_distinct(string_split(text, ' ')) AS t
                FROM documents WHERE doc_id = 0),
              lex AS (
                SELECT d.doc_id,
                  CAST(len(list_intersect(list_distinct(string_split(d.text, ' ')),
                    qt.t)) AS BIGINT) AS overlap
                FROM documents d CROSS JOIN qt WHERE d.doc_id <> 0),
              lr AS (
                SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY -overlap, doc_id) AS r_lex
                FROM lex),
              qv AS (
                SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings WHERE vec_id = 0),
              vec AS (
                SELECT e.vec_id AS doc_id,
                  list_cosine_similarity(
                    list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                    qv.v) AS cos
                FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
              vr AS (
                SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY -cos, doc_id) AS r_vec
                FROM vec)
              SELECT l.doc_id, l.r_lex, v.r_vec,
                CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + r_lex) +
                  CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + r_vec) AS rrf
              FROM lr l JOIN vr v USING (doc_id)
              ORDER BY rrf DESC, doc_id LIMIT 20""")),

    // MLM / denoising corruption prep: deterministically mask ~12.5%
    // of token positions (md5(doc_id:pos) first nibble in {0,1}) and
    // emit the corrupted text next to the ordered target tokens — the
    // masked-language-model training-pair generator, reproducible
    // across runs AND engines because the mask is pure hash, not RNG.
    // Map-only until the per-doc reassembly (one keyed collect of
    // (pos, token) pairs, arrays bounded by document length).
    QueryDef("q178_mlm_mask",
      (s, d) => {
        val tok = table(s, d, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
          .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
          .withColumn("masked",
            substring(md5(concat_ws(":", col("doc_id"), col("pos"))), 1, 1)
              .isin("0", "1"))
        tok.groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_tokens"),
            count(when(col("masked"), 1)).as("n_masked"),
            array_join(
              transform(sort_array(collect_list(struct(col("pos").as("pos"),
                when(col("masked"), lit("[MASK]")).otherwise(col("tok")).as("out")))),
                x => x.getField("out")), " ").as("corrupted"),
            array_join(
              transform(sort_array(collect_list(when(col("masked"),
                struct(col("pos").as("pos"), col("tok").as("tok"))))),
                x => x.getField("tok")), ",").as("targets"))
          .select("doc_id", "n_tokens", "n_masked", "corrupted", "targets")
          .orderBy("doc_id")
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              tok AS (
                SELECT doc_id, i AS pos, w[i] AS tok FROM
                  (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM ws) t),
              m AS (
                SELECT doc_id, pos, tok,
                  substring(md5(concat_ws(':', doc_id, pos)), 1, 1) IN ('0','1') AS masked
                FROM tok)
              SELECT doc_id,
                CAST(COUNT(*) AS BIGINT) AS n_tokens,
                CAST(COUNT(CASE WHEN masked THEN 1 END) AS BIGINT) AS n_masked,
                string_agg(CASE WHEN masked THEN '[MASK]' ELSE tok END, ' '
                           ORDER BY pos) AS corrupted,
                COALESCE(string_agg(CASE WHEN masked THEN tok END, ',' ORDER BY pos),
                         '') AS targets
              FROM m GROUP BY doc_id ORDER BY doc_id""")))
}
