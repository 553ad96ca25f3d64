package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Dedup
import QueryDef.table

/** Round-4 widening: incremental-ingestion operators a training-data
  * pipeline runs continuously — cross-corpus dedup of a new batch
  * against the existing lake, tokenizer vocabulary/OOV coverage,
  * minhash-vs-exact Jaccard estimate quality, and n-gram novelty
  * scoring (first-occurrence attribution).
  *
  * Same determinism rules as the rest of the suite: ratios are IEEE
  * quotients of exact integers, md5 is the only hash, every output is
  * totally ordered, BIGINT casts wherever DuckDB would widen.
  */
object Extras3 {

  val all: Seq[QueryDef] = Seq(

    // incremental cross-corpus dedup: drop incoming docs whose content
    // fingerprint already exists in the lake — the "dedup the new crawl
    // against 100 TB of existing corpus" step. One anti-join on the
    // md5 fingerprint: only 16-byte fingerprints shuffle, never text,
    // and the probe side is the (small) incoming batch.
    QueryDef("q123_cross_dedup",
      (s, d) => {
        val docs = table(s, d, "documents")
        val corpus = docs.filter(col("doc_id") % 7 =!= 0)
          .select(md5(col("text")).as("fp")).distinct()
        docs.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
          .join(corpus, Seq("fp"), "left_anti")
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
                SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 7 <> 0),
              inc AS (
                SELECT doc_id, lang, md5(text) AS fp FROM documents WHERE doc_id % 7 = 0)
              SELECT doc_id, lang FROM inc
              WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = inc.fp)
              ORDER BY doc_id""")),

    // tokenizer vocabulary coverage: vocab = top-100 corpus tokens
    // (ties → token asc, so the cut is deterministic); per document the
    // out-of-vocabulary token count and rate. The vocab is one
    // aggregate + limit (tiny) and BROADCAST to the coverage join —
    // the token stream never shuffles twice.
    QueryDef("q124_vocab_coverage",
      (s, d) => {
        val tok = table(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val vocab = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(100)
          .select(col("tok"), lit(1).as("__v"))
        tok.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            count(when(col("__v").isNull, 1)).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            (col("n_oov").cast(DoubleType) / col("n_tokens").cast(DoubleType))
              .as("oov_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
              v AS (SELECT tok FROM (
                      SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
                      ORDER BY cnt DESC, tok LIMIT 100) t)
              SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                CAST(COUNT(CASE WHEN v.tok IS NULL THEN 1 END) AS BIGINT) AS n_oov,
                CAST(COUNT(CASE WHEN v.tok IS NULL THEN 1 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS oov_frac
              FROM tok t LEFT JOIN v ON t.tok = v.tok
              GROUP BY t.doc_id ORDER BY t.doc_id""")),

    // minhash estimate quality: for each adjacent doc pair, the
    // 8-hash minhash Jaccard estimate (matching components / 8) next
    // to the exact distinct-word Jaccard — the sketch-vs-truth audit a
    // pipeline runs before trusting LSH thresholds at scale. Both
    // sides are md5-derived → engine-portable; both ratios are IEEE
    // quotients of exact integers, emitted raw.
    QueryDef("q125_minhash_jaccard_est",
      (s, d) => {
        val docs = table(s, d, "documents")
        val f = Dedup.minhashSignatures(docs, "doc_id", split(col("text"), " "), 8)
          .join(docs.select(col("doc_id"),
            array_distinct(split(col("text"), " ")).as("w")), "doc_id")
        val matches = (0 until 8)
          .map(i => when(col(s"a.mh$i") === col(s"b.mh$i"), 1).otherwise(0))
          .reduce(_ + _)
        f.alias("a")
          .join(f.alias("b"), col("a.doc_id") + 1 === col("b.doc_id"))
          .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
            (matches.cast(DoubleType) / 8.0).as("est_jaccard"),
            (size(array_intersect(col("a.w"), col("b.w"))).cast(DoubleType) /
              size(array_union(col("a.w"), col("b.w"))).cast(DoubleType))
              .as("exact_jaccard"))
          .orderBy("id1")
      },
      Some("""WITH dw AS (SELECT DISTINCT doc_id, w FROM
                (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t),
              sig AS (SELECT doc_id,
                  MIN(md5('0:' || w)) AS mh0, MIN(md5('1:' || w)) AS mh1,
                  MIN(md5('2:' || w)) AS mh2, MIN(md5('3:' || w)) AS mh3,
                  MIN(md5('4:' || w)) AS mh4, MIN(md5('5:' || w)) AS mh5,
                  MIN(md5('6:' || w)) AS mh6, MIN(md5('7:' || w)) AS mh7
                FROM dw GROUP BY doc_id),
              sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM dw GROUP BY doc_id),
              inter AS (SELECT a.doc_id AS id1, CAST(COUNT(*) AS BIGINT) AS ni
                        FROM dw a JOIN dw b ON a.w = b.w AND b.doc_id = a.doc_id + 1
                        GROUP BY 1),
              est AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                  (CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END) +
                  (CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END) +
                  (CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END) +
                  (CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) +
                  (CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) +
                  (CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) +
                  (CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END) +
                  (CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) AS m
                FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1)
              SELECT e.id1, e.id2,
                CAST(e.m AS DOUBLE) / 8.0 AS est_jaccard,
                CAST(COALESCE(i.ni, 0) AS DOUBLE)
                  / CAST(sa.n + sb.n - COALESCE(i.ni, 0) AS DOUBLE) AS exact_jaccard
              FROM est e
                LEFT JOIN inter i ON i.id1 = e.id1
                JOIN sz sa ON sa.doc_id = e.id1
                JOIN sz sb ON sb.doc_id = e.id2
              ORDER BY e.id1""")),

    // n-gram novelty: per document, the fraction of its distinct
    // 3-word shingles that FIRST appear in it (global first-occurrence
    // attribution by min doc_id) — the curation signal for "how much
    // new content does this doc add". Two aggregations + one join,
    // all keyed by shingle; shuffles carry shingle strings and ids.
    QueryDef("q126_ngram_novelty",
      (s, d) => {
        val grams = table(s, d, "documents")
          .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("g"))
        val first = grams.groupBy("g").agg(min("doc_id").as("first_id"))
        grams.join(first, "g")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            count(when(col("first_id") === col("doc_id"), 1)).as("n_novel"))
          .select(col("doc_id"), col("n_grams"), col("n_novel"),
            (col("n_novel").cast(DoubleType) / col("n_grams").cast(DoubleType))
              .as("novel_frac"))
          .orderBy("doc_id")
      },
      // sh mirrors Dedup.shingles' short-doc fallback (same CTE as q36)
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              sh AS (SELECT DISTINCT doc_id, s FROM
                (SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s FROM
                  (SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 1, 2))) AS i FROM ws) t1) t2),
              f AS (SELECT s, MIN(doc_id) AS first_id FROM sh GROUP BY s)
              SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                CAST(COUNT(CASE WHEN f.first_id = sh.doc_id THEN 1 END) AS BIGINT) AS n_novel,
                CAST(COUNT(CASE WHEN f.first_id = sh.doc_id THEN 1 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS novel_frac
              FROM sh JOIN f ON f.s = sh.s
              GROUP BY sh.doc_id ORDER BY sh.doc_id"""))
  )
}
