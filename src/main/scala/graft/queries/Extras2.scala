package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Corpus
import QueryDef.table

/** Round-3 second widening: positional tokenization, n-gram language
  * model counts, paragraph(chunk)-level dedup, corpus mixture
  * accounting, weighted deterministic sampling, mode/argmax
  * aggregates, date-spine gap fill, month-over-month deltas, a
  * rational diversity index, native array set operations, and
  * small-file compaction planning.
  *
  * Determinism rules (memory/graft-correctness-rules): decimal sums
  * for money, no round() on emitted doubles, every float expression
  * either a raw input value or an IEEE quotient/product of exact
  * integers/decimals written identically in both dialects, total
  * ORDER BY on row-level outputs, BIGINT casts wherever DuckDB would
  * widen to HUGEINT.
  */
object Extras2 {

  import Money.DSUM

  /** 12-bit uniform in [0,4096) from the first three md5 hex nibbles
    * of column `h` — pure string ops, evaluates identically in Spark
    * and DuckDB (same trick as Sketches.BUCKET).
    */
  private val U12 =
    """(instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 256 +
       (instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 16 +
       (instr('0123456789abcdef', substring(h, 3, 1)) - 1)"""

  val all: Seq[QueryDef] = Seq(

    // positional tokenization: token + 0-based position, first 5
    // tokens per document. Slice BEFORE posexplode so the generator
    // fans out only the needed prefix — at corpus scale the explode
    // output is 5 rows/doc, not |doc| rows/doc. Map-only, no shuffle.
    QueryDef("q103_posexplode",
      (s, d) => table(s, d, "documents")
        .filter(col("doc_id") <= 50)
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 5)))
        .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
          col("col").as("tok"))
        .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i + 1] AS tok FROM
                (SELECT doc_id, w, unnest(range(0, LEAST(len(w), 5))) AS i FROM
                  (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                   WHERE doc_id <= 50) x) y
              ORDER BY doc_id, pos""")),

    // bigram language-model counts: c(w1,w2), c(w1) and the
    // conditional ratio. The bigram generator is sequence → explode →
    // element_at (codegen'd, no lambda HOFs — those are interpreted);
    // c(w1) comes from a window over the already-aggregated bigram
    // frame, so the second pass runs on |vocab²| rows, not the token
    // stream. The ratio is an IEEE quotient of exact integers.
    QueryDef("q104_bigram_lm",
      (s, d) => {
        val toks = split(col("text"), " ")
        val grams = table(s, d, "documents")
          .select(toks.as("w"))
          .filter(size(col("w")) >= 2)
          .select(explode(sequence(lit(1), size(col("w")) - 1)).as("i"), col("w"))
          .select(element_at(col("w"), col("i")).as("w1"),
            element_at(col("w"), col("i") + 1).as("w2"))
        val counts = grams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        counts
          .withColumn("c1", sum(col("c12")).over(Window.partitionBy("w1")))
          .filter(col("c12") >= 40)
          .select(col("w1"), col("w2"), col("c12"), col("c1"),
            (col("c12").cast(DoubleType) / col("c1").cast(DoubleType)).as("cond_p"))
          .orderBy("w1", "w2")
      },
      Some("""WITH g AS (
                SELECT w[i] AS w1, w[i + 1] AS w2 FROM
                  (SELECT w, unnest(range(1, len(w))) AS i FROM
                    (SELECT string_split(text, ' ') AS w FROM documents) x
                   WHERE len(w) >= 2) y),
              c AS (SELECT w1, w2, COUNT(*) AS c12 FROM g GROUP BY w1, w2),
              t AS (SELECT w1, w2, c12, SUM(c12) OVER (PARTITION BY w1) AS c1 FROM c)
              SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
                CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS cond_p
              FROM t WHERE c12 >= 40 ORDER BY w1, w2""")),

    // paragraph-level dedup (chunk granularity): cut every document
    // into 20-token chunks, keep the FIRST occurrence of each
    // identical chunk corpus-wide ((doc_id, chunk_id) order), report
    // per-document survival. The global keep-first is one window over
    // the chunk hash — state per reducer is one chunk group, and the
    // chunk generator itself is map-only (Corpus.chunk).
    QueryDef("q105_chunk_dedup",
      (s, d) => {
        val w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_id")
        Corpus.chunk(table(s, d, "documents"), "doc_id", "text", 20, 20)
          .withColumn("rn", row_number().over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            count(when(col("rn") > 1, 1)).as("n_dup_chunks"))
          .withColumn("kept_frac",
            (col("n_chunks") - col("n_dup_chunks")).cast(DoubleType) /
              col("n_chunks").cast(DoubleType))
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (
                SELECT doc_id, CAST(st / 20 AS BIGINT) AS chunk_id,
                  md5(array_to_string(list_slice(w, st + 1, st + 20), ' ')) AS chunk_md5
                FROM (SELECT doc_id, w, unnest(range(0, GREATEST(len(w), 1), 20)) AS st
                      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) x) y),
              r AS (SELECT doc_id,
                      ROW_NUMBER() OVER (PARTITION BY chunk_md5
                                         ORDER BY doc_id, chunk_id) AS rn
                    FROM ch)
              SELECT doc_id, COUNT(*) AS n_chunks,
                COUNT(CASE WHEN rn > 1 THEN 1 END) AS n_dup_chunks,
                CAST(COUNT(*) - COUNT(CASE WHEN rn > 1 THEN 1 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS kept_frac
              FROM r GROUP BY doc_id ORDER BY doc_id""")),

    // corpus mixture accounting: per (source, lang) document and
    // token counts plus the basis-point share of the corpus —
    // the bookkeeping behind training-mixture weights. The share
    // denominator is a 1-row broadcast agg (same shape as q100), and
    // the share itself stays in integer basis points (BIGINT div) so
    // the output is float-free.
    QueryDef("q106_domain_mixture",
      (s, d) => {
        val docs = table(s, d, "documents")
          .select(col("source"), col("lang"), size(split(col("text"), " "))
            .cast(LongType).as("n_toks"))
        val grouped = docs.groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
        val total = grouped.agg(sum("n_docs").as("total_docs"))
        grouped.crossJoin(broadcast(total))
          .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
            // `div`, not `/`: Spark's / on longs is float division
            expr("n_docs * 10000 div total_docs").as("share_bp"))
          .orderBy("source", "lang")
      },
      Some("""WITH g AS (
                SELECT source, lang, COUNT(*) AS n_docs,
                  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source, lang),
              t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM g)
              SELECT source, lang, n_docs, n_tokens,
                n_docs * 10000 // total_docs AS share_bp
              FROM g, t ORDER BY source, lang""")),

    // weighted deterministic sampling: Bernoulli keep with
    // p = min(n_chars, 1000)/1000, decided by a 12-bit uniform from
    // the doc id's md5 — the importance-sampling step of corpus
    // mixing, as a pure map-side integer predicate (u * 1000 <
    // w * 4096 — no floats, no RNG state, reproducible under any
    // partitioning and in any engine).
    QueryDef("q107_weighted_sample",
      (s, d) => table(s, d, "documents")
        .select(col("lang"), least(col("n_chars"), lit(1000L)).as("wt"),
          md5(col("doc_id").cast(StringType)).as("h"))
        .withColumn("u", expr(U12))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("u") * 1000L < col("wt") * 4096L, 1)).as("n_kept"),
          sum(when(col("u") * 1000L < col("wt") * 4096L, col("wt"))
            .otherwise(lit(0L))).as("w_kept"))
        .orderBy("lang"),
      Some(s"""WITH s AS (
                SELECT lang, LEAST(n_chars, 1000) AS wt,
                  md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents),
              u AS (SELECT lang, wt, $U12 AS u FROM s)
              SELECT lang, COUNT(*) AS n_total,
                COUNT(CASE WHEN u * 1000 < wt * 4096 THEN 1 END) AS n_kept,
                CAST(SUM(CASE WHEN u * 1000 < wt * 4096 THEN wt ELSE 0 END) AS BIGINT)
                  AS w_kept
              FROM u GROUP BY lang ORDER BY lang""")),

    // mode + argmax aggregates: per nation the most frequent market
    // segment (ties → smallest segment) and the top customer by
    // balance (ties → smallest key). Both are keep-first windows over
    // pre-aggregated/grouped frames; deterministic tie-breaks make
    // them hash-stable (plain mode()/max_by() tie behavior is
    // engine-defined — this shape is the portable form).
    QueryDef("q108_mode_argmax",
      (s, d) => {
        val cust = table(s, d, "customer")
        val modeW = Window.partitionBy("c_nationkey")
          .orderBy(col("cnt").desc, col("c_mktsegment"))
        val mode = cust.groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(modeW))
          .filter(col("rn") === 1)
          .select(col("c_nationkey"), col("c_mktsegment").as("mode_segment"),
            col("cnt").as("mode_cnt"))
        val topW = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        val top = cust
          .withColumn("rn", row_number().over(topW))
          .filter(col("rn") === 1)
          .select(col("c_nationkey"), col("c_custkey").as("top_custkey"),
            col("c_acctbal").as("top_bal"))
        mode.join(top, "c_nationkey").orderBy("c_nationkey")
      },
      Some("""WITH m AS (
                SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt,
                  ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                     ORDER BY COUNT(*) DESC, c_mktsegment) AS rn
                FROM customer GROUP BY c_nationkey, c_mktsegment),
              t AS (
                SELECT c_nationkey, c_custkey, c_acctbal,
                  ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey) AS rn
                FROM customer)
              SELECT m.c_nationkey, m.c_mktsegment AS mode_segment,
                CAST(m.cnt AS BIGINT) AS mode_cnt,
                t.c_custkey AS top_custkey, t.c_acctbal AS top_bal
              FROM m JOIN t ON t.c_nationkey = m.c_nationkey AND t.rn = 1
              WHERE m.rn = 1 ORDER BY m.c_nationkey""")),

    // date-spine gap fill: generate every month between the first and
    // last order month (sequence → explode from a 1-row broadcast
    // bounds agg — the spine is computed, never stored) and left-join
    // the monthly rollup with zero-fill. The canonical time-series
    // densification; the fact side is aggregated before it meets the
    // spine.
    QueryDef("q109_date_spine",
      (s, d) => {
        val o = table(s, d, "orders")
          .select(trunc(to_date(col("o_orderdate")), "month").as("m"),
            col("o_totalprice"))
        val bounds = o.agg(min("m").as("lo"), max("m").as("hi"))
        val spine = bounds
          .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("month"))
        val monthly = o.groupBy(col("m").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev"))
        spine.join(monthly, Seq("month"), "left")
          .select(col("month"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("rev").cast(DoubleType), lit(0.0)).as("revenue"))
          .orderBy("month")
      },
      Some("""WITH b AS (
                SELECT MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS lo,
                  MAX(CAST(date_trunc('month', o_orderdate) AS DATE)) AS hi
                FROM orders),
              spine AS (
                SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE)
                  AS month FROM b),
              m AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                  COUNT(*) AS n_orders,
                  SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
                FROM orders GROUP BY 1)
              SELECT s.month, COALESCE(m.n_orders, 0) AS n_orders,
                COALESCE(CAST(m.rev AS DOUBLE), 0.0) AS revenue
              FROM spine s LEFT JOIN m ON m.month = s.month ORDER BY s.month""")),

    // month-over-month revenue deltas: lag over the monthly rollup.
    // Delta is computed in exact DECIMAL then cast (order-free);
    // the growth ratio is the IEEE quotient of the two decimal-exact
    // doubles. The window runs over ~|months| rows, not the fact
    // table.
    QueryDef("q110_mom_change",
      (s, d) => {
        val monthly = table(s, d, "orders")
          .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev"))
        val w = Window.orderBy("month")
        monthly
          .withColumn("prev", lag(col("rev"), 1).over(w))
          .select(col("month"), col("rev").cast(DoubleType).as("revenue"),
            col("prev").cast(DoubleType).as("prev_revenue"),
            (col("rev") - col("prev")).cast(DoubleType).as("delta"),
            (col("rev").cast(DoubleType) / col("prev").cast(DoubleType)).as("ratio"))
          .orderBy("month")
      },
      Some("""WITH m AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                  SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
                FROM orders GROUP BY 1),
              l AS (SELECT month, rev, LAG(rev, 1) OVER (ORDER BY month) AS prev FROM m)
              SELECT month, CAST(rev AS DOUBLE) AS revenue,
                CAST(prev AS DOUBLE) AS prev_revenue,
                CAST(rev - prev AS DOUBLE) AS delta,
                CAST(rev AS DOUBLE) / CAST(prev AS DOUBLE) AS ratio
              FROM l ORDER BY month""")),

    // rational diversity index: per-document Gini impurity of the
    // token distribution, 1 - Σc²/n² — the log-free cousin of token
    // entropy (same quality-filter role, but built only from +,*,/
    // on exact integers, so it hash-compares across engines where
    // ln() would not). Two-level agg, map-side combine on (doc, tok).
    QueryDef("q111_gini_diversity",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") * col("c")).as("sum_c2"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("sum_c2"),
          (lit(1.0) - col("sum_c2").cast(DoubleType) /
            (col("n_tokens").cast(DoubleType) * col("n_tokens").cast(DoubleType)))
            .as("gini"))
        .orderBy("doc_id"),
      Some("""WITH tc AS (
                SELECT doc_id, tok, COUNT(*) AS c FROM
                  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
                GROUP BY doc_id, tok),
              a AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                  CAST(COUNT(*) AS BIGINT) AS n_distinct,
                  CAST(SUM(c * c) AS BIGINT) AS sum_c2
                FROM tc GROUP BY doc_id)
              SELECT doc_id, n_tokens, n_distinct, sum_c2,
                1.0 - CAST(sum_c2 AS DOUBLE)
                  / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS gini
              FROM a ORDER BY doc_id""")),

    // native array set operations: vocabulary overlap of adjacent
    // documents via array_distinct/intersect/union — the typed-array
    // API surface (vs q37's explode-join formulation of the same
    // semantics). Self-join on a shifted key; sizes are
    // order-insensitive so no sort_array is needed.
    QueryDef("q112_array_setops",
      (s, d) => {
        val docs = table(s, d, "documents")
          .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
        val a = docs.select(col("doc_id").as("id1"), col("toks").as("t1"))
        val b = docs.select((col("doc_id") - 1).as("id1"), col("toks").as("t2"))
        a.join(b, "id1")
          .select(col("id1"), size(col("t1")).cast(LongType).as("n1"),
            size(col("t2")).cast(LongType).as("n2"),
            size(array_intersect(col("t1"), col("t2"))).cast(LongType).as("n_inter"),
            size(array_union(col("t1"), col("t2"))).cast(LongType).as("n_union"))
          .withColumn("jaccard",
            col("n_inter").cast(DoubleType) / col("n_union").cast(DoubleType))
          .orderBy("id1")
      },
      Some("""WITH d AS (
                SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                FROM documents)
              SELECT a.doc_id AS id1,
                CAST(len(a.toks) AS BIGINT) AS n1,
                CAST(len(b.toks) AS BIGINT) AS n2,
                CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
                CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS BIGINT) AS n_union,
                CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE)
                  AS jaccard
              FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
              ORDER BY id1""")),

    // small-file compaction planning: per source, total bytes and the
    // 64 KiB-target file count — the layout-maintenance calculation a
    // lake compactor runs per partition. ceil stays in integer
    // arithmetic ((n + cap - 1) / cap); only the mean is a float.
    QueryDef("q113_compaction_plan",
      (s, d) => table(s, d, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_bytes"))
        .select(col("source"), col("n_docs"), col("total_bytes"),
          ((col("total_bytes") + 65535L) / 65536L).cast(LongType).as("target_files"),
          (col("total_bytes").cast(DoubleType) / col("n_docs").cast(DoubleType))
            .as("avg_bytes"))
        .orderBy("source"),
      Some("""SELECT source, COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
                CAST((SUM(n_chars) + 65535) // 65536 AS BIGINT) AS target_files,
                CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_bytes
              FROM documents GROUP BY source ORDER BY source""")),

    // BPE tokenizer training, step one: corpus-frequency-weighted
    // adjacent character-pair counts. Word counts are aggregated
    // FIRST (map-side combine collapses the token stream to the
    // vocabulary), then the pair generator explodes each distinct
    // word once and weights by its count — at corpus scale the
    // expensive fan-out runs over |vocab|, not |tokens|.
    QueryDef("q114_bpe_pairs",
      (s, d) => {
        val words = table(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          .filter(length(col("w")) >= 2)
        words
          .select(col("w"), col("cnt"),
            explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
          .select(expr("substring(w, i, 2)").as("pair"), col("cnt"))
          .groupBy("pair").agg(sum("cnt").as("n"))
          .filter(col("n") >= 1000)
          .orderBy("pair")
      },
      Some("""WITH wc AS (
                SELECT w, COUNT(*) AS cnt FROM
                  (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
                GROUP BY w HAVING length(w) >= 2),
              p AS (
                SELECT substr(w, i, 2) AS pair, cnt FROM
                  (SELECT w, cnt, unnest(range(1, length(w))) AS i FROM wc) x)
              SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
              FROM p GROUP BY pair HAVING SUM(cnt) >= 1000 ORDER BY pair""")),

    // cross-lingual vocabulary overlap: Jaccard between per-language
    // vocabularies for every language pair. The corpus-sized work
    // (tokenize + distinct) runs ONCE: tokens collapse to a per-token
    // language set (|global vocab| rows, localCheckpoint'd so the two
    // consumers don't re-evaluate the corpus lineage — the q36
    // lesson), then language pairs expand per token and sizes come
    // from the same frame. Union size is inclusion-exclusion — no
    // second join against the corpus.
    QueryDef("q115_lang_vocab_overlap",
      (s, d) => {
        val tokLangs = table(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok").agg(sort_array(collect_set(col("lang"))).as("langs"))
          .transform(graft.ops.Pinned.pin)
        val sizes = tokLangs.select(explode(col("langs")).as("lang"))
          .groupBy("lang").agg(count(lit(1)).as("v"))
        val inter = tokLangs
          .select(posexplode(col("langs")).as(Seq("i", "lang1")), col("langs"))
          .select(col("lang1"),
            explode(slice(col("langs"), col("i") + 2, size(col("langs")))).as("lang2"))
          .groupBy("lang1", "lang2").agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.withColumnRenamed("lang", "lang1").withColumnRenamed("v", "v1"), "lang1")
          .join(sizes.withColumnRenamed("lang", "lang2").withColumnRenamed("v", "v2"), "lang2")
          .select(col("lang1"), col("lang2"), col("v1"), col("v2"), col("n_inter"),
            (col("n_inter").cast(DoubleType) /
              (col("v1") + col("v2") - col("n_inter")).cast(DoubleType)).as("jaccard"))
          .orderBy("lang1", "lang2")
      },
      Some("""WITH vocab AS (
                SELECT DISTINCT lang, tok FROM
                  (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents) t),
              sizes AS (SELECT lang, COUNT(*) AS v FROM vocab GROUP BY lang),
              inter AS (
                SELECT a.lang AS lang1, b.lang AS lang2, COUNT(*) AS n_inter
                FROM vocab a JOIN vocab b ON b.tok = a.tok AND a.lang < b.lang
                GROUP BY a.lang, b.lang)
              SELECT lang1, lang2, CAST(v1.v AS BIGINT) AS v1, CAST(v2.v AS BIGINT) AS v2,
                CAST(n_inter AS BIGINT) AS n_inter,
                CAST(n_inter AS DOUBLE) / CAST(v1.v + v2.v - n_inter AS DOUBLE) AS jaccard
              FROM inter
              JOIN sizes v1 ON v1.lang = inter.lang1
              JOIN sizes v2 ON v2.lang = inter.lang2
              ORDER BY lang1, lang2""")),

    // strict ordered funnel: view → click-after-view →
    // purchase-after-click per user, counted globally. Each stage is
    // a conditional min-timestamp join against the previous stage's
    // per-user watermark — three shuffles on user_id which AQE
    // coalesces, with the event scan filtered to the three relevant
    // types before any shuffle.
    QueryDef("q116_event_funnel",
      (s, d) => {
        val ev = table(s, d, "events")
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t_view"))
        val clicks = ev.filter(col("event_type") === "click")
          .join(views, "user_id")
          .filter(col("ts") > col("t_view"))
          .groupBy("user_id").agg(min("ts").as("t_click"))
        val buys = ev.filter(col("event_type") === "purchase")
          .join(clicks, "user_id")
          .filter(col("ts") > col("t_click"))
          .groupBy("user_id").agg(min("ts").as("t_buy"))
        views.agg(count(lit(1)).as("n_view"))
          .crossJoin(clicks.agg(count(lit(1)).as("n_click_after_view")))
          .crossJoin(buys.agg(count(lit(1)).as("n_purchase_after_click")))
      },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                         WHERE event_type = 'view' GROUP BY user_id),
              c AS (SELECT e.user_id, MIN(e.ts) AS t_click
                    FROM events e JOIN v ON v.user_id = e.user_id
                    WHERE e.event_type = 'click' AND e.ts > v.t_view
                    GROUP BY e.user_id),
              p AS (SELECT e.user_id, MIN(e.ts) AS t_buy
                    FROM events e JOIN c ON c.user_id = e.user_id
                    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                    GROUP BY e.user_id)
              SELECT (SELECT COUNT(*) FROM v) AS n_view,
                (SELECT COUNT(*) FROM c) AS n_click_after_view,
                (SELECT COUNT(*) FROM p) AS n_purchase_after_click""")),

    // retention cohorts: users grouped by first-activity week,
    // counted per whole-week offset they return in. Two aggs over the
    // (user, week) distinct frame — the event stream collapses to
    // ≤ |users|×|weeks| rows before the cohort join, and the offset
    // is whole-day integer arithmetic on week-start dates divided by
    // 7 (identical in both engines; Monday week start in both).
    QueryDef("q117_retention_cohorts",
      (s, d) => {
        val um = table(s, d, "events")
          .select(col("user_id"),
            trunc(col("ts").cast(DateType), "week").as("wk"))
          .distinct()
        val cohort = um.groupBy("user_id").agg(min("wk").as("cohort_week"))
        um.join(cohort, "user_id")
          .groupBy(col("cohort_week"),
            (datediff(col("wk"), col("cohort_week")) / 7).cast(LongType).as("offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_week", "offset")
      },
      Some("""WITH um AS (
                SELECT DISTINCT user_id,
                  CAST(date_trunc('week', ts) AS DATE) AS wk
                FROM events),
              cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM um GROUP BY user_id)
              SELECT c.cohort_week,
                CAST(date_diff('day', c.cohort_week, um.wk) / 7 AS BIGINT) AS "offset",
                COUNT(DISTINCT um.user_id) AS n_users
              FROM um JOIN cohort c ON c.user_id = um.user_id
              GROUP BY c.cohort_week, "offset"
              ORDER BY c.cohort_week, "offset"""")),

    // time-weighted average: per-user mean of `value` weighted by the
    // seconds each reading was current (lead-to-next duration; the
    // last reading carries no duration). The standard irregular-
    // time-series aggregate. Durations are whole-second BIGINTs
    // (truncating on both engines), the numerator accumulates in
    // exact DECIMAL, and the average is one IEEE quotient — portable.
    // One shuffle on user_id shared by the window and the agg.
    QueryDef("q119_time_weighted_avg",
      (s, d) => {
        // order by truncated seconds + event_id (NOT full-precision ts):
        // the oracle sees whole seconds only, and sub-second ordering
        // differences would pair value×duration differently
        val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
        table(s, d, "events")
          .filter(col("user_id") <= 100)
          .select(col("user_id"), col("event_id"), col("value"),
            col("ts").cast(TimestampType).cast(LongType).as("sec"))
          .withColumn("dur", lead(col("sec"), 1).over(w) - col("sec"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum("dur").as("total_secs"),
            (sum(col("value").cast(DecimalType(18, 4)) * col("dur")).cast(DoubleType) /
              sum(col("dur")).cast(DoubleType)).as("twa"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (
                SELECT user_id, event_id, value,
                  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
                FROM events WHERE user_id <= 100),
              du AS (
                SELECT user_id, value,
                  LEAD(sec, 1) OVER (PARTITION BY user_id ORDER BY sec, event_id) - sec
                    AS dur
                FROM e)
              SELECT user_id, COUNT(*) AS n_events,
                CAST(SUM(dur) AS BIGINT) AS total_secs,
                CAST(SUM(CAST(value AS DECIMAL(18,4)) * dur) AS DOUBLE)
                  / CAST(SUM(dur) AS DOUBLE) AS twa
              FROM du GROUP BY user_id ORDER BY user_id""")),

    // token co-occurrence lift: for mid-frequency tokens, how much
    // more often a pair shares a document than independence predicts
    // (N·c_xy / (df_x·df_y) — PMI's log-free core, an IEEE quotient
    // of exact integers). Per-doc qualifying tokens collapse to ONE
    // sorted array and pairs expand per doc (the q36 shape — never a
    // corpus self-join); the df side is vocabulary-sized and
    // broadcast.
    QueryDef("q120_cooccur_lift",
      (s, d) => {
        val docs = table(s, d, "documents")
        val nDocs = docs.count()
        val dw = docs
          .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        val df = dw.groupBy("tok").agg(count(lit(1)).as("df"))
          .filter(col("df").between(50, 400))
        val perDoc = dw.join(broadcast(df), "tok")
          .groupBy("doc_id").agg(sort_array(collect_list(col("tok"))).as("toks"))
        val pairs = perDoc
          .select(posexplode(col("toks")).as(Seq("i", "t1")), col("toks"))
          .select(col("t1"),
            explode(slice(col("toks"), col("i") + 2, size(col("toks")))).as("t2"))
          .groupBy("t1", "t2").agg(count(lit(1)).as("c12"))
          .filter(col("c12") >= 100)
        pairs
          .join(broadcast(df.select(col("tok").as("t1"), col("df").as("df1"))), "t1")
          .join(broadcast(df.select(col("tok").as("t2"), col("df").as("df2"))), "t2")
          .select(col("t1"), col("t2"), col("c12"), col("df1"), col("df2"),
            (lit(nDocs).cast(DoubleType) * col("c12").cast(DoubleType) /
              (col("df1").cast(DoubleType) * col("df2").cast(DoubleType))).as("lift"))
          .orderBy("t1", "t2")
      },
      Some("""WITH dw AS (
                SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents),
              n AS (SELECT COUNT(*) AS n_docs FROM documents),
              f AS (SELECT tok, COUNT(*) AS df FROM dw GROUP BY tok
                    HAVING COUNT(*) BETWEEN 50 AND 400),
              q AS (SELECT dw.doc_id, dw.tok FROM dw JOIN f ON f.tok = dw.tok),
              p AS (SELECT a.tok AS t1, b.tok AS t2, COUNT(*) AS c12
                    FROM q a JOIN q b ON b.doc_id = a.doc_id AND a.tok < b.tok
                    GROUP BY a.tok, b.tok HAVING COUNT(*) >= 100)
              SELECT t1, t2, c12, f1.df AS df1, f2.df AS df2,
                CAST(n_docs AS DOUBLE) * CAST(c12 AS DOUBLE)
                  / (CAST(f1.df AS DOUBLE) * CAST(f2.df AS DOUBLE)) AS lift
              FROM p JOIN f f1 ON f1.tok = p.t1 JOIN f f2 ON f2.tok = p.t2, n
              ORDER BY t1, t2""")),

    // snapshot diff / CDC derivation: classify every key between two
    // table versions (ADDED / REMOVED / CHANGED / UNCHANGED) with the
    // exact-decimal balance delta per class — the comparison a lake
    // runs to turn two snapshots into a change feed. One full-outer
    // shuffle on the key; the classification is pure row-local
    // expressions, and the rollup rides the same partitioning.
    QueryDef("q121_snapshot_diff",
      (s, d) => {
        val base = table(s, d, "customer")
        // snapshot B: drop %97 keys, shift %7 balances, append new keys
        val next = base.filter(col("c_custkey") % 97 =!= 0)
          .select(col("c_custkey"),
            when(col("c_custkey") % 7 === 0, col("c_acctbal") + 50.0)
              .otherwise(col("c_acctbal")).as("c_acctbal"))
          .unionAll(base.filter(col("c_custkey") % 100 === 0)
            .select((col("c_custkey") + 2000000L).as("c_custkey"), col("c_acctbal")))
        val a = base.select(col("c_custkey").as("k"), col("c_acctbal").as("bal_a"))
        val b = next.select(col("c_custkey").as("k"), col("c_acctbal").as("bal_b"))
        a.join(b, Seq("k"), "full_outer")
          .select(
            when(col("bal_a").isNull, "ADDED")
              .when(col("bal_b").isNull, "REMOVED")
              .when(col("bal_a") =!= col("bal_b"), "CHANGED")
              .otherwise("UNCHANGED").as("change_type"),
            coalesce(col("bal_b"), lit(0.0)).cast(DecimalType(18, 4))
              .minus(coalesce(col("bal_a"), lit(0.0)).cast(DecimalType(18, 4)))
              .as("delta"))
          .groupBy("change_type")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("delta")).cast(DoubleType).as("sum_bal_delta"))
          .orderBy("change_type")
      },
      Some("""WITH nxt AS (
                SELECT c_custkey,
                  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 50.0
                       ELSE c_acctbal END AS c_acctbal
                FROM customer WHERE c_custkey % 97 <> 0
                UNION ALL
                SELECT c_custkey + 2000000, c_acctbal
                FROM customer WHERE c_custkey % 100 = 0),
              j AS (
                SELECT CASE WHEN a.c_custkey IS NULL THEN 'ADDED'
                            WHEN b.c_custkey IS NULL THEN 'REMOVED'
                            WHEN a.c_acctbal <> b.c_acctbal THEN 'CHANGED'
                            ELSE 'UNCHANGED' END AS change_type,
                  CAST(COALESCE(b.c_acctbal, 0.0) AS DECIMAL(18,4))
                    - CAST(COALESCE(a.c_acctbal, 0.0) AS DECIMAL(18,4)) AS delta
                FROM customer a FULL OUTER JOIN nxt b ON b.c_custkey = a.c_custkey)
              SELECT change_type, COUNT(*) AS n_rows,
                CAST(SUM(delta) AS DOUBLE) AS sum_bal_delta
              FROM j GROUP BY change_type ORDER BY change_type""")),

    // deterministic fixed-size per-group sample ("hash reservoir"):
    // exactly k rows per group — the k smallest md5(key) ranks. A
    // uniform sample with NO RNG state: reproducible across engines,
    // runs, partitionings, and insertion order, unlike a true
    // reservoir. One shuffle on the group key; rank+filter runs
    // inside the group partition. Complements q75's per-stratum
    // Bernoulli rates (fractional) with exact-count semantics —
    // the train/eval-split sampler.
    QueryDef("q122_reservoir_sample",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("h"), col("o_orderkey"))
        table(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            md5(col("o_orderkey").cast(StringType)).as("h"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select(col("o_orderpriority"), col("rn").cast(LongType).as("rn"),
            col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_orderpriority", "rn")
      },
      Some("""SELECT o_orderpriority, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
              FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                      ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                        ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
                    FROM orders) t
              WHERE rn <= 10
              ORDER BY o_orderpriority, rn"""))
  )
}
