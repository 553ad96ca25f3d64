package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Frontier, Intervals, Ranks}
import QueryDef.table

/** Round-4 widening, batch 2: clustering, curation planning, and the
  * two classic "no equi-key" plan shapes done scale-safely.
  *
  *  - one Lloyd iteration of k-means over the embedding corpus
  *    (broadcast centroids; assignment is a map-side argmin)
  *  - Pareto frontier through `ops/Frontier.skyline` — a staircase
  *    aggregation + de-skewed prefix-min instead of the O(n²)
  *    dominance anti-join
  *  - interval overlap self-join through `ops/Intervals` month-grid
  *    banding instead of a nested-loop theta join
  *  - lexical diversity, mixture upsampling plan, null-safe join,
  *    de-skewed per-group top-k string aggregation
  *
  * Determinism: decimal accumulators for every data-sized double sum;
  * IEEE quotients/sqrt of identically-derived operands elsewhere;
  * every output totally ordered (NULLS FIRST pinned where a key can
  * be null).
  */
object Extras5 {

  import Money.{dsum8, DSUM8}

  val all: Seq[QueryDef] = Seq(

    // one Lloyd iteration of k-means: seed centroids = vec_id < 8
    // (deterministic init), assignment by L2 argmin against the
    // BROADCAST centroid set (map-side — no shuffle touches the
    // vectors), then per-cluster sizes + the first two centroid-mean
    // components through decimal accumulators. The k-means building
    // block for IVF coarse quantizers (q80) and corpus clustering; at
    // 100 TB the assignment pass stays an embarrassingly-parallel
    // scan, and the recompute shuffles k×dim partial sums, not data.
    // Distance is sqrt of a left-to-right double fold — bit-matching
    // DuckDB's sequential list_distance loop; argmin ties break to
    // the lowest centroid id on both engines.
    QueryDef("q142_kmeans_assign",
      (s, d) => {
        val emb = table(s, d, "embeddings")
        val asDouble = (c: org.apache.spark.sql.Column) =>
          transform(c, x => x.cast(DoubleType))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), asDouble(col("embedding")).as("cv"))
        val dist = emb
          .select(col("vec_id"), asDouble(col("embedding")).as("vv"))
          .crossJoin(broadcast(cents))
          .select(col("vec_id"), col("cid"),
            sqrt(aggregate(
              zip_with(col("vv"), col("cv"), (x, y) => (x - y) * (x - y)),
              lit(0.0), (acc, x) => acc + x)).as("dist"))
        val assign = dist.groupBy("vec_id")
          .agg(min(struct(col("dist"), col("cid"))).as("m"))
          .select(col("vec_id"), col("m.cid").as("cid"))
        assign.join(emb, "vec_id")
          .select(col("cid"),
            element_at(col("embedding"), 1).cast(DoubleType).as("v0"),
            element_at(col("embedding"), 2).cast(DoubleType).as("v1"))
          .groupBy("cid")
          .agg(count(lit(1)).as("n"),
            (dsum8(col("v0")) / count(lit(1))).as("c0"),
            (dsum8(col("v1")) / count(lit(1))).as("c1"))
          .orderBy("cid")
      },
      Some(s"""WITH c AS (SELECT vec_id AS cid,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
                    FROM embeddings WHERE vec_id < 8),
              v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
                    FROM embeddings),
              d AS (SELECT v.vec_id, c.cid,
                      row_number() OVER (PARTITION BY v.vec_id
                        ORDER BY list_distance(v.vv, c.cv), c.cid) AS rn
                    FROM v CROSS JOIN c),
              a AS (SELECT vec_id, cid FROM d WHERE rn = 1)
              SELECT a.cid, CAST(COUNT(*) AS BIGINT) AS n,
                ${DSUM8("CAST(e.embedding[1] AS DOUBLE)")} / COUNT(*) AS c0,
                ${DSUM8("CAST(e.embedding[2] AS DOUBLE)")} / COUNT(*) AS c1
              FROM a JOIN embeddings e ON e.vec_id = a.vec_id
              GROUP BY a.cid ORDER BY a.cid""")),

    // lexical diversity: type-token ratio + hapax share per document —
    // the cheap curation signal next to q111's gini and q86's
    // repetition ratio. One tokenize + two keyed aggregations; exact
    // integers and a single IEEE quotient.
    QueryDef("q143_lexical_diversity",
      (s, d) => {
        val tf = table(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        tf.groupBy("doc_id")
          .agg(sum("tf").as("n_tokens"),
            count(lit(1)).as("n_types"),
            count(when(col("tf") === 1, 1)).as("n_hapax"))
          .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
            (col("n_types").cast(DoubleType) / col("n_tokens").cast(DoubleType))
              .as("ttr"))
          .orderBy("doc_id")
      },
      Some("""WITH tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM
                (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents) t GROUP BY doc_id, tok)
              SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                CAST(COUNT(*) AS BIGINT) AS n_types,
                CAST(COUNT(CASE WHEN tf = 1 THEN 1 END) AS BIGINT) AS n_hapax,
                CAST(COUNT(*) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS ttr
              FROM tf GROUP BY doc_id ORDER BY doc_id""")),

    // Pareto-efficient suppliers (maximize revenue, minimize average
    // ship delay): the multi-criteria "best suppliers" cut. The
    // frontier runs through ops/Frontier.skyline — staircase agg +
    // prefix-min, NOT the O(n²) dominance anti-join the oracle spells.
    QueryDef("q144_pareto_suppliers",
      (s, d) => {
        val m = table(s, d, "lineitem")
          .join(table(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_suppkey").as("suppkey"))
          .agg(
            dsum8(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("revenue"),
            (sum(datediff(col("l_shipdate"), col("o_orderdate")))
              .cast(DoubleType) / count(lit(1))).as("avg_delay"))
        Frontier.skyline(m, "revenue", "avg_delay")
          .select("suppkey", "revenue", "avg_delay")
          .orderBy(col("revenue").desc, col("suppkey"))
      },
      Some(s"""WITH m AS (SELECT l_suppkey AS suppkey,
                 ${DSUM8("l_extendedprice * (1 - l_discount)")} AS revenue,
                 CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE)
                   / COUNT(*) AS avg_delay
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               GROUP BY 1)
              SELECT suppkey, revenue, avg_delay FROM m r
              WHERE NOT EXISTS (SELECT 1 FROM m o
                WHERE o.revenue >= r.revenue AND o.avg_delay <= r.avg_delay
                  AND (o.revenue > r.revenue OR o.avg_delay < r.avg_delay))
              ORDER BY revenue DESC, suppkey""")),

    // repeat-purchase bursts: pairs of same-customer orders whose
    // 30-day windows overlap, counted per customer. The naive theta
    // join goes through the plans/BandedRangeJoin interval-overlap
    // rewrite (equi-join on (custkey, 30-day band cell) + residual
    // predicate + first-shared-band exactly-once emission), not the
    // nested-loop theta join in the oracle.
    QueryDef("q145_overlap_bursts",
      (s, d) => {
        val o = table(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          expr("o_orderdate + INTERVAL 30 DAY").as("w_end"))
        // o_orderdate is physically timestamp[us] → bands quantize
        // epoch micros; 30-day bands match the window width
        Intervals.overlapPairsSameKey(o, "o_custkey", "o_orderkey",
            col("o_orderdate"), col("w_end"),
            binSize = 30L * 86400L * 1000000L)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_overlaps"))
          .orderBy(col("n_overlaps").desc, col("custkey"))
          .limit(20)
      },
      Some("""WITH w AS (SELECT o_custkey AS k, o_orderkey AS id,
                  o_orderdate AS s, o_orderdate + INTERVAL 30 DAY AS e
                FROM orders)
              SELECT a.k AS custkey, CAST(COUNT(*) AS BIGINT) AS n_overlaps
              FROM w a JOIN w b
                ON a.k = b.k AND a.id < b.id AND a.s <= b.e AND b.s <= a.e
              GROUP BY 1 ORDER BY n_overlaps DESC, custkey LIMIT 20""")),

    // null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    // group survives the join key — a plain equality would silently
    // drop it. Demo key folds 'click' to NULL.
    QueryDef("q146_nullsafe_join",
      (s, d) => {
        val e = table(s, d, "events")
        val k = nullif(col("event_type"), lit("click"))
        val a = e.groupBy(k.as("k")).agg(count(lit(1)).as("n_all"))
        val b = e.filter(col("value") >= 1.0)
          .groupBy(k.as("k")).agg(count(lit(1)).as("n_big"))
        a.join(b, a("k") <=> b("k"), "left")
          .select(a("k").as("k"), col("n_all"),
            coalesce(col("n_big"), lit(0L)).as("n_big"))
          .orderBy(asc_nulls_first("k"))
      },
      Some("""WITH a AS (SELECT nullif(event_type, 'click') AS k, COUNT(*) AS n_all
                         FROM events GROUP BY 1),
              b AS (SELECT nullif(event_type, 'click') AS k, COUNT(*) AS n_big
                    FROM events WHERE value >= 1.0 GROUP BY 1)
              SELECT a.k, CAST(a.n_all AS BIGINT) AS n_all,
                CAST(COALESCE(b.n_big, 0) AS BIGINT) AS n_big
              FROM a LEFT JOIN b ON a.k IS NOT DISTINCT FROM b.k
              ORDER BY a.k NULLS FIRST""")),

    // ordered per-group top-k string aggregation: the 3 longest docs
    // per source as a CSV id list. Top-k runs through Ranks.groupRanked
    // (de-skewed — a source-partitioned row_number window would cap
    // parallelism at the source count), so the collect_list only ever
    // sees ≤ k rows per group, never the corpus.
    QueryDef("q147_top_docs_concat",
      (s, d) => {
        val ranked = Ranks.groupRanked(
          table(s, d, "documents")
            .select(col("source"), col("doc_id"), col("n_chars"),
              (-col("n_chars")).as("__negc"), (-col("doc_id")).as("__negid")),
          "source", "__negc", Seq("__negid"))
        ranked.filter(col("rn") <= 3)
          .groupBy("source")
          .agg(array_join(
            transform(sort_array(collect_list(struct(col("rn"), col("doc_id")))),
              x => x.getField("doc_id").cast(StringType)),
            ",").as("top_ids"))
          .orderBy("source")
      },
      Some("""WITH r AS (SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id DESC) AS rn
                FROM documents)
              SELECT source, string_agg(doc_id, ',' ORDER BY rn) AS top_ids
              FROM r WHERE rn <= 3 GROUP BY source ORDER BY source""")),

    // mixture upsampling plan: per-source token mass vs a uniform
    // target share → sampling factor and whole-epoch repeat count.
    // The "how many epochs of each domain" table a training-mix
    // rebalance starts from (q106 reports shares; this prescribes).
    QueryDef("q148_upsample_plan",
      (s, d) => {
        val stats = table(s, d, "documents")
          .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("toks"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
        val totals = stats.agg(
          sum("n_tokens").as("tot"), count(lit(1)).as("n_src"))
        stats.crossJoin(broadcast(totals))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            (col("tot").cast(DoubleType) /
              (col("n_src") * col("n_tokens")).cast(DoubleType)).as("factor"))
          .withColumn("epochs",
            greatest(lit(1L), floor(col("factor"))).cast(LongType))
          .orderBy("source")
      },
      Some("""WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source),
              t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
                           CAST(COUNT(*) AS BIGINT) AS n_src FROM s)
              SELECT source, n_docs, n_tokens,
                CAST(tot AS DOUBLE) / CAST(n_src * n_tokens AS DOUBLE) AS factor,
                CAST(GREATEST(1, FLOOR(CAST(tot AS DOUBLE)
                  / CAST(n_src * n_tokens AS DOUBLE))) AS BIGINT) AS epochs
              FROM s CROSS JOIN t ORDER BY source"""))
  )
}
