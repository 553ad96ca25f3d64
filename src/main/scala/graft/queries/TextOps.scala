package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Dedup, TextStats}
import QueryDef.table

/** Text-analysis + deduplication suite over the `documents` corpus.
  * Both hash families are md5-based (engine-portable), so every stage —
  * MinHash signatures, LSH candidate pairs, SimHash fingerprints and
  * Hamming-band near-dups — is verifiable bit-for-bit against the
  * DuckDB oracle, custom Catalyst expressions included.
  */
object TextOps {

  /** Shared oracle fragment: distinct whitespace tokens per doc. */
  private val DistinctWords =
    """SELECT DISTINCT doc_id, w FROM
         (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) raw"""

  /** Shared oracle fragment: per-doc SimHash-64 fingerprint, bit-exact
    * with [[graft.functions.SimHash64]]. The 64-bit token hash is the
    * first 8 bytes of md5 (big-endian), reconstructed here nibble by
    * nibble from the md5 hex string: bit b lives in hex char
    * 16-(b/4) (1-based from the left), at in-nibble position b%4.
    * The sign bit (63) is folded in as Java two's-complement so the
    * final value equals Spark's LongType exactly.
    */
  private val SimhashFp =
    """toks AS (
         SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents),
       hx AS (
         SELECT doc_id, source, substr(md5(tok), 1, 16) AS hx FROM toks),
       bits AS (
         SELECT doc_id, source, b AS bit,
           ((strpos('0123456789abcdef', substr(hx, 16 - (b // 4), 1)) - 1) >> (b % 4)) & 1 AS v
         FROM hx CROSS JOIN (SELECT unnest(range(64)) AS b)),
       votes AS (
         SELECT doc_id, source, bit, SUM(CASE WHEN v = 1 THEN 1 ELSE -1 END) AS vote
         FROM bits GROUP BY 1, 2, 3),
       fp AS (
         SELECT doc_id, source,
           CAST(SUM(CASE WHEN vote > 0 AND bit < 63 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
             + CASE WHEN MAX(CASE WHEN bit = 63 AND vote > 0 THEN 1 ELSE 0 END) = 1
                    THEN -9223372036854775807 - 1 ELSE 0 END AS BIGINT) AS simhash
         FROM votes GROUP BY 1, 2)"""

  val all: Seq[QueryDef] = Seq(

    // per-document stats: tokens, chars, stopwords, punctuation, quality, fingerprint
    QueryDef("q30_text_stats",
      (s, d) => TextStats.documentStats(table(s, d, "documents")).orderBy("doc_id"),
      Some("""WITH base AS (
                SELECT doc_id, lang, text,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(length(text) AS BIGINT) AS n_chars_actual,
                  CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('the','a','and','of','to','in','is','it'))) AS BIGINT) AS n_stopwords
                FROM documents),
              derived AS (
                SELECT doc_id, lang, n_tokens, n_chars_actual, n_stopwords,
                  ROUND(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                    / GREATEST(CAST(length(text) AS DOUBLE), 1.0), 4) AS punct_ratio,
                  ROUND(CAST(n_chars_actual - (n_tokens - 1) AS DOUBLE)
                    / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 4) AS avg_word_len,
                  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
                FROM base)
              SELECT doc_id, lang, n_tokens, n_chars_actual, n_stopwords, punct_ratio, avg_word_len,
                ROUND(LEAST(CAST(n_stopwords AS DOUBLE) / GREATEST(CAST(n_tokens AS DOUBLE), 1.0) * 2.0, 1.0) * 0.5
                  + CASE WHEN avg_word_len >= 3.0 AND avg_word_len <= 9.0 THEN 0.3 ELSE 0.0 END
                  + CASE WHEN punct_ratio <= 0.05 THEN 0.2 ELSE 0.0 END, 4) AS quality,
                fp
              FROM derived ORDER BY doc_id""")),

    // corpus rollup: token volume per language
    QueryDef("q31_lang_token_agg",
      (s, d) => table(s, d, "documents")
        .select(col("lang"), TextStats.tokenCount(col("text")).as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          (sum(col("n_tokens")).cast(DoubleType) / count(lit(1))).as("avg_tokens"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_tokens
              FROM (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents) t
              GROUP BY lang ORDER BY lang""")),

    // language-ID heuristic vs the labeled lang column (confusion counts)
    QueryDef("q32_lang_guess",
      (s, d) => table(s, d, "documents")
        .select(col("lang"), TextStats.langGuess(col("text")).as("guess"))
        .groupBy("lang", "guess")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "guess"),
      Some("""SELECT lang, guess, COUNT(*) AS n FROM (
                SELECT lang,
                  CASE
                    WHEN ' '||text||' ' LIKE '% the %' OR ' '||text||' ' LIKE '% and %'
                      OR ' '||text||' ' LIKE '% with %' THEN 'en'
                    WHEN ' '||text||' ' LIKE '% el %' OR ' '||text||' ' LIKE '% la %'
                      OR ' '||text||' ' LIKE '% los %' OR ' '||text||' ' LIKE '% que %' THEN 'es'
                    WHEN ' '||text||' ' LIKE '% der %' OR ' '||text||' ' LIKE '% die %'
                      OR ' '||text||' ' LIKE '% und %' OR ' '||text||' ' LIKE '% das %' THEN 'de'
                    WHEN ' '||text||' ' LIKE '% le %' OR ' '||text||' ' LIKE '% les %'
                      OR ' '||text||' ' LIKE '% des %' OR ' '||text||' ' LIKE '% est %' THEN 'fr'
                    WHEN ' '||text||' ' LIKE '% de %' OR ' '||text||' ' LIKE '% shi %'
                      OR ' '||text||' ' LIKE '% zai %' THEN 'zh'
                    ELSE 'und' END AS guess
                FROM documents) t
              GROUP BY lang, guess ORDER BY lang, guess""")),

    // exact dedup groups by content fingerprint (hash once, group by 128-bit key)
    QueryDef("q33_dedup_exact",
      (s, d) => Dedup.exactGroups(table(s, d, "documents")).orderBy("fp"),
      Some("""SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
                MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
              FROM documents GROUP BY 1 ORDER BY fp""")),

    // window-rank dedup: deterministic keep-first
    QueryDef("q34_dedup_keepfirst",
      (s, d) => Dedup.dedupKeepFirst(table(s, d, "events"),
          Seq("user_id", "event_type"), "event_id")
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type, event_id FROM (
                SELECT user_id, event_type, event_id,
                  ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
                FROM events) t
              WHERE rn = 1 ORDER BY user_id, event_type""")),

    // 4-hash MinHash signatures over word sets (md5-min, engine-portable)
    QueryDef("q35_minhash_sig",
      (s, d) => Dedup.minhashSignatures(table(s, d, "documents"),
          "doc_id", split(col("text"), " "), 4)
        .orderBy("doc_id"),
      Some(s"""WITH dw AS ($DistinctWords)
              SELECT doc_id,
                MIN(md5('0:' || w)) AS mh0, MIN(md5('1:' || w)) AS mh1,
                MIN(md5('2:' || w)) AS mh2, MIN(md5('3:' || w)) AS mh3
              FROM dw GROUP BY doc_id ORDER BY doc_id""")),

    // MinHash + LSH candidate pairs over 3-word shingles (8 hashes, 4 bands of 2)
    QueryDef("q36_lsh_pairs",
      (s, d) => Dedup.lshCandidatePairs(table(s, d, "documents"),
          "doc_id", Dedup.shingles(col("text"), 3), numHashes = 8, rowsPerBand = 2)
        .orderBy("id1", "id2"),
      Some("""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              -- GREATEST bound + clamped slice mirror Dedup.shingles'
              -- fallback: docs with fewer than 3 tokens produce ONE
              -- shingle (the whole text) instead of dropping out
              sh AS (SELECT DISTINCT doc_id, s FROM
                (SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s FROM
                  (SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 1, 2))) AS i FROM ws) t1) t2),
              sig AS (SELECT doc_id,
                  MIN(md5('0:' || s)) AS mh0, MIN(md5('1:' || s)) AS mh1,
                  MIN(md5('2:' || s)) AS mh2, MIN(md5('3:' || s)) AS mh3,
                  MIN(md5('4:' || s)) AS mh4, MIN(md5('5:' || s)) AS mh5,
                  MIN(md5('6:' || s)) AS mh6, MIN(md5('7:' || s)) AS mh7
                FROM sh GROUP BY doc_id),
              bands AS (
                SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS sig FROM sig UNION ALL
                SELECT doc_id, 1 AS band, md5(mh2 || mh3) AS sig FROM sig UNION ALL
                SELECT doc_id, 2 AS band, md5(mh4 || mh5) AS sig FROM sig UNION ALL
                SELECT doc_id, 3 AS band, md5(mh6 || mh7) AS sig FROM sig)
              SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
              ORDER BY id1, id2""")),

    // exact n-gram Jaccard between consecutive docs (verification stage shape)
    QueryDef("q37_ngram_jaccard",
      (s, d) => {
        val docs = table(s, d, "documents")
        val a = docs.select(col("doc_id").as("id1"),
          array_distinct(split(col("text"), " ")).as("w1"))
        val b = docs.select((col("doc_id") - 1).as("id1"), col("doc_id").as("id2"),
          array_distinct(split(col("text"), " ")).as("w2"))
        a.join(b, "id1")
          .select(col("id1"), col("id2"), Dedup.jaccard(col("w1"), col("w2")).as("jaccard"))
          .orderBy("id1")
      },
      Some(s"""WITH dw AS ($DistinctWords),
              sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM dw GROUP BY doc_id),
              pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
              inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS ni
                        FROM dw a JOIN dw b ON a.w = b.w AND b.doc_id = a.doc_id + 1
                        GROUP BY 1, 2)
              SELECT p.id1, p.id2,
                ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE)
                  / GREATEST(CAST(sa.n + sb.n - COALESCE(i.ni, 0) AS DOUBLE), 1.0), 4) AS jaccard
              FROM pairs p
                LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2
                JOIN sz sa ON sa.doc_id = p.id1
                JOIN sz sb ON sb.doc_id = p.id2
              ORDER BY p.id1""")),

    // SimHash fingerprints via the custom Catalyst expression plus the
    // Hamming distance to the previous doc's fingerprint within the
    // same source (keyed window — never a global single-partition sort).
    // The md5-derived token hash makes the fingerprint engine-portable,
    // so this IS oracle-checkable: DuckDB rebuilds the identical 64
    // bits from md5 hex nibbles (see SimhashFp).
    QueryDef("q38_simhash",
      (s, d) => {
        import graft.functions.functions.{simhash64, hamming64}
        val w = Window.partitionBy("source").orderBy("doc_id")
        table(s, d, "documents")
          .select(col("doc_id"), col("source"),
            simhash64(split(col("text"), " ")).as("simhash"))
          .withColumn("hamming_prev", hamming64(col("simhash"),
            coalesce(lag(col("simhash"), 1).over(w), col("simhash"))))
          .orderBy("doc_id")
      },
      Some(s"""WITH $SimhashFp
              SELECT doc_id, source, simhash,
                CAST(bit_count(xor(simhash,
                  COALESCE(lag(simhash) OVER (PARTITION BY source ORDER BY doc_id), simhash))) AS INT)
                  AS hamming_prev
              FROM fp ORDER BY doc_id""")),

    // SimHash near-dup candidate pairs via Hamming banding (Manku et
    // al., WWW 2007): split the 64-bit fingerprint into 4×16-bit bands;
    // any pair within Hamming distance 3 must share at least one band
    // (pigeonhole), so candidate generation is an equi-join on
    // (band, key) — never a pairwise scan. Oracle-checked via the
    // md5-nibble SimHash reconstruction (SimhashFp).
    QueryDef("q57_simhash_neardup",
      (s, d) => {
        import graft.functions.functions.{simhash64, hamming64}
        val docs = table(s, d, "documents")
          .select(col("doc_id"), simhash64(split(col("text"), " ")).as("h"))
        val bandCols = (0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("h"), b * 16).bitwiseAND(lit(0xffffL)).as("key")))
        val bands = docs
          .select(col("doc_id"), col("h"), explode(array(bandCols: _*)).as("bk"))
          .select(col("doc_id"), col("h"), col("bk.band").as("band"), col("bk.key").as("key"))
        // bucket-aggregate + per-bucket pair expansion (the q36 shape):
        // the simhash lineage runs once, not twice as a self-join's
        // two inputs would
        bands
          .groupBy("band", "key")
          .agg(sort_array(collect_list(struct(col("doc_id"), col("h")))).as("__ds"))
          .filter(size(col("__ds")) >= 2)
          .select(posexplode(col("__ds")).as(Seq("__i", "__d1")), col("__ds"))
          .select(col("__d1"),
            explode(slice(col("__ds"), col("__i") + 2, size(col("__ds")))).as("__d2"))
          .select(col("__d1.doc_id").as("id1"), col("__d2.doc_id").as("id2"),
            hamming64(col("__d1.h"), col("__d2.h")).as("hamming"))
          .distinct()
          .filter(col("hamming") <= 8)
          .orderBy("id1", "id2")
      },
      Some(s"""WITH $SimhashFp,
              bands AS (
                SELECT doc_id, simhash AS h, b AS band, (simhash >> (b * 16)) & 65535 AS key
                FROM fp CROSS JOIN (SELECT unnest(range(4)) AS b)),
              pairs AS (
                SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                  CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
              SELECT id1, id2, hamming FROM pairs WHERE hamming <= 8 ORDER BY id1, id2"""))
  )
}
