package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Ranks
import QueryDef.table

/** Round-4 widening, batch 4: statistical QA, tokenization prep, and
  * pagination — the remaining everyday shapes of a curation pipeline.
  *
  * Determinism: decimal accumulators for data-sized sums; variance /
  * t-statistic / Benford expectations are IEEE arithmetic over those
  * exact sums (log10/sqrt correctly rounded, quotients of identical
  * operands identical); token-id maps and collapses are pure integer
  * and string work.
  */
object Extras7 {

  import Money.{dsum8, DSUM8}

  val all: Seq[QueryDef] = Seq(

    // Welch's t-statistic between two event populations (purchase vs
    // click values): the drift / A-B sanity check a pipeline runs on
    // metric distributions. Exact decimal sums + one final row of
    // IEEE arithmetic — one aggregation pass over the fact stream.
    QueryDef("q153_welch_ttest",
      (s, d) => {
        val e = table(s, d, "events")
          .filter(col("event_type").isin("purchase", "click"))
        val m = e.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            dsum8(col("value")).as("sv"),
            dsum8(col("value") * col("value")).as("svv"))
          .select(col("event_type"), col("n"),
            (col("sv") / col("n")).as("mean"),
            ((col("svv") - col("sv") * col("sv") / col("n")) /
              (col("n") - 1)).as("var"))
        val a = m.filter(col("event_type") === "purchase")
          .select(col("n").as("n1"), col("mean").as("mean1"), col("var").as("var1"))
        val b = m.filter(col("event_type") === "click")
          .select(col("n").as("n2"), col("mean").as("mean2"), col("var").as("var2"))
        a.crossJoin(b)
          .select(col("n1"), col("n2"), col("mean1"), col("mean2"),
            ((col("mean1") - col("mean2")) /
              sqrt(col("var1") / col("n1") + col("var2") / col("n2"))).as("t_stat"))
      },
      Some(s"""WITH m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                  ${DSUM8("value")} AS sv, ${DSUM8("value * value")} AS svv
                FROM events WHERE event_type IN ('purchase', 'click')
                GROUP BY event_type),
              s AS (SELECT event_type, n, sv / n AS mean,
                      (svv - sv * sv / n) / (n - 1) AS var FROM m),
              a AS (SELECT n AS n1, mean AS mean1, var AS var1 FROM s
                    WHERE event_type = 'purchase'),
              b AS (SELECT n AS n2, mean AS mean2, var AS var2 FROM s
                    WHERE event_type = 'click')
              SELECT n1, n2, mean1, mean2,
                (mean1 - mean2) / sqrt(var1 / n1 + var2 / n2) AS t_stat
              FROM a CROSS JOIN b""")),

    // vocabulary-truncated tokenization: map every token to its id in
    // the top-64 global vocabulary (rank by count desc, token — the
    // deterministic tie), UNK=0 elsewhere; re-assemble ids in position
    // order per document. The id map is broadcast-sized by
    // construction (top-K); positions ride posexplode, reassembly is
    // one keyed collect of (pos, id) pairs per doc — no windows.
    QueryDef("q154_tokenize_ids",
      (s, d) => {
        val tok = table(s, d, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        val vocab = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(64)
          .select(col("tok"),
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("cnt").desc, col("tok"))).cast(LongType).as("tid"))
        tok.join(broadcast(vocab), Seq("tok"), "left")
          .select(col("doc_id"), col("pos"), coalesce(col("tid"), lit(0L)).as("tid"))
          .groupBy("doc_id")
          .agg(
            array_join(
              transform(sort_array(collect_list(struct(col("pos").as("pos"), col("tid").as("tid")))),
                x => x.getField("tid").cast(StringType)), ",").as("ids"),
            count(when(col("tid") === 0L, 1)).as("n_unk"),
            count(lit(1)).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              tok AS (SELECT doc_id, i AS pos, w[i] AS tok FROM
                (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM ws) t),
              vocab AS (SELECT tok,
                  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS tid
                FROM (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
                      ORDER BY cnt DESC, tok LIMIT 64) v),
              m AS (SELECT t.doc_id, t.pos, COALESCE(v.tid, 0) AS tid
                    FROM tok t LEFT JOIN vocab v USING (tok))
              SELECT doc_id, string_agg(tid, ',' ORDER BY pos) AS ids,
                CAST(COUNT(CASE WHEN tid = 0 THEN 1 END) AS BIGINT) AS n_unk,
                CAST(COUNT(*) AS BIGINT) AS n_tokens
              FROM m GROUP BY doc_id ORDER BY doc_id""")),

    // keyset-free pagination (ORDER BY … LIMIT 10 OFFSET 100) done
    // scale-safe: the global rank comes from Ranks.groupRanked over a
    // constant group (range repartition splits the VALUE domain), so
    // "rows 101–110 of the global order" never funnels the table
    // through one reducer the way a global row_number window would.
    QueryDef("q155_paginate",
      (s, d) => {
        val o = table(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            lit(1).as("__g"), (-col("o_totalprice")).as("__negp"))
        Ranks.groupRanked(o, "__g", "__negp", Seq("o_orderkey"))
          .filter(col("rn") > 100 && col("rn") <= 110)
          .select(col("rn").as("pos"), col("o_orderkey"), col("o_totalprice"))
          .orderBy("pos")
      },
      Some("""SELECT CAST(100 + ROW_NUMBER() OVER
                  (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS pos,
                o_orderkey, o_totalprice
              FROM (SELECT o_orderkey, o_totalprice FROM orders
                    ORDER BY o_totalprice DESC, o_orderkey
                    LIMIT 10 OFFSET 100) t
              ORDER BY pos""")),

    // consecutive-repeat collapse ("the the the" → "the"): the
    // intra-document cleaning pass next to q86's repetition RATIOS —
    // this one rewrites the text. Pure map work (indexed array
    // filter), no shuffle at all until the output sort.
    QueryDef("q156_collapse_repeats",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          size(col("w")).cast(LongType).as("n_tokens"),
          // when() keeps element_at away from index 0 (ANSI mode errors
          // on it even under a short-circuiting-looking ||)
          array_join(
            filter(col("w"), (x, i) =>
              when(i === 0, lit(true))
                .otherwise(x =!= element_at(col("w"), i))), " ").as("collapsed"))
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") - size(split(col("collapsed"), " "))).cast(LongType)
            .as("n_removed"),
          col("collapsed"))
        .orderBy("doc_id"),
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
              SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                CAST(len(w) - len(list_filter(w, (x, i) -> i = 1 OR x <> w[i - 1]))
                  AS BIGINT) AS n_removed,
                array_to_string(list_filter(w, (x, i) -> i = 1 OR x <> w[i - 1]), ' ')
                  AS collapsed
              FROM ws ORDER BY doc_id""")),

    // Benford leading-digit audit over order totals: observed counts
    // per digit vs the log10(1+1/d) expectation — the cheap
    // fabricated-data / unit-mixup detector for numeric columns. One
    // map + one 9-group aggregation; expectation is IEEE log10 of
    // integer ratios.
    QueryDef("q157_benford",
      (s, d) => {
        val o = table(s, d, "orders")
          .filter(col("o_totalprice") >= 1.0)
          .select(substring(floor(col("o_totalprice")).cast(LongType)
            .cast(StringType), 1, 1).as("digit"))
        val n = o.agg(count(lit(1)).as("n_total"))
        o.groupBy("digit").agg(count(lit(1)).as("n_obs"))
          .crossJoin(broadcast(n))
          .select(col("digit"), col("n_obs"),
            (log10(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType)) *
              col("n_total").cast(DoubleType)).as("n_expected"))
          .orderBy("digit")
      },
      Some("""WITH d AS (SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS digit
                FROM orders WHERE o_totalprice >= 1.0),
              n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d)
              SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs,
                log10(1.0 + 1.0 / CAST(digit AS DOUBLE))
                  * CAST(n_total AS DOUBLE) AS n_expected
              FROM d CROSS JOIN n
              GROUP BY digit, n_total ORDER BY digit"""))
  )
}
