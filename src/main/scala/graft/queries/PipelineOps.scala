package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Corpus, Dedup, TextStats}
import QueryDef.table

/** Training-corpus preparation suite: the operations a production
  * LLM-data pipeline runs between "raw corpus" and "training shards" —
  * chunking, scrubbing, quality filtering, benchmark decontamination,
  * stratified sampling, shard assignment, duplicate-cluster
  * resolution, deterministic shuffling, and sequence packing.
  * Every query is oracle-checked (md5 is the only hash anywhere, so
  * DuckDB reproduces each step bit-for-bit).
  */
object PipelineOps {

  import Money.DSUM8

  /** Oracle fragment: word 3-gram shingles with the whole-text
    * fallback for short docs — mirrors [[graft.ops.Dedup.shingles]]
    * (same shape as the q36 oracle), parameterized by source CTE.
    */
  private def shinglesSql(src: String): String =
    s"""(SELECT DISTINCT doc_id, s FROM
          (SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s FROM
            (SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 1, 2))) AS i FROM
              (SELECT doc_id, string_split(text, ' ') AS w FROM $src) ws) t1) t2)"""

  /** Oracle CTE chain ending in `clusters (id, cluster)` — the MinHash
    * band candidates + recursive connected components mirroring
    * [[graft.ops.Corpus.duplicateClusters]] over
    * [[graft.ops.Dedup.lshCandidatePairs]] (8 hashes, 2 rows/band).
    * Must follow a `WITH RECURSIVE`. Shared by the q77 oracle and
    * q300's leakage-free split. */
  private[queries] val dupClusterCtes: String = """
              ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
                SELECT doc_id, 3 AS band, md5(mh6 || mh7) AS sig FROM sig),
              cand AS (
                SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
              edges AS (SELECT id1 AS src, id2 AS dst FROM cand
                        UNION ALL SELECT id2, id1 FROM cand),
              reach(id, root) AS (
                SELECT DISTINCT src, src FROM edges
                UNION
                SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
              clusters AS (SELECT id, MIN(root) AS cluster FROM reach GROUP BY id)"""

  val all: Seq[QueryDef] = Seq(

    // fixed-size token-window chunking with overlap (context-window prep):
    // per-row generator, no shuffle — output co-partitioned with the scan
    QueryDef("q71_chunk_documents",
      (s, d) => Corpus.chunk(table(s, d, "documents"), "doc_id", "text",
          chunkTokens = 64, stride = 48)
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
              st AS (SELECT doc_id, toks, unnest(range(0, GREATEST(len(toks), 1), 48)) AS start
                     FROM t)
              SELECT doc_id,
                CAST(start / 48 AS BIGINT) AS chunk_id,
                CAST(LEAST(64, len(toks) - start) AS BIGINT) AS n_chunk_tokens,
                md5(array_to_string(list_slice(toks, start + 1, start + 64), ' ')) AS chunk_md5
              FROM st ORDER BY doc_id, chunk_id""")),

    // PII-style scrubbing: redact digit runs and a configurable entity
    // lexicon, count redactions — map-only regexp passes, codegen'd
    QueryDef("q72_scrub",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          regexp_count(col("text"), lit("[0-9]+")).cast(LongType).as("n_nums"),
          regexp_count(col("text"), lit("customer")).cast(LongType).as("n_entities"),
          md5(regexp_replace(regexp_replace(col("text"), "[0-9]+", "<NUM>"),
            "customer", "<ENTITY>")).as("scrubbed_md5"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums,
                CAST(len(regexp_extract_all(text, 'customer')) AS BIGINT) AS n_entities,
                md5(regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
                  'customer', '<ENTITY>', 'g')) AS scrubbed_md5
              FROM documents ORDER BY doc_id""")),

    // quality-filter verdicts (C4/Gopher-style rule cascade) — reuses
    // the oracle-proven q30 metric formulas; first failing rule wins
    QueryDef("q73_quality_filter",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          TextStats.tokenCount(col("text")).as("n_tokens"),
          TextStats.qualityScore(col("text")).as("quality"),
          TextStats.punctRatio(col("text")).as("punct_ratio"))
        .withColumn("verdict",
          when(col("n_tokens") < 200, "too_short")
            .when(col("punct_ratio") > 0.1, "noisy")
            .when(col("quality") < 0.5, "low_quality")
            .otherwise("keep"))
        .orderBy("doc_id"),
      Some("""WITH m AS (
                SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('the','a','and','of','to','in','is','it'))) AS BIGINT) AS n_stop,
                  CAST(length(text) AS BIGINT) AS n_chars,
                  ROUND(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                    / GREATEST(CAST(length(text) AS DOUBLE), 1.0), 4) AS punct_ratio
                FROM documents),
              q AS (
                SELECT doc_id, n_tokens, punct_ratio,
                  ROUND(CAST(n_chars - (n_tokens - 1) AS DOUBLE)
                    / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 4) AS awl
                FROM m),
              sc AS (
                SELECT q.doc_id, q.n_tokens, q.punct_ratio,
                  ROUND(LEAST(CAST(m.n_stop AS DOUBLE) / GREATEST(CAST(q.n_tokens AS DOUBLE), 1.0)
                      * 2.0, 1.0) * 0.5
                    + CASE WHEN q.awl >= 3.0 AND q.awl <= 9.0 THEN 0.3 ELSE 0.0 END
                    + CASE WHEN q.punct_ratio <= 0.05 THEN 0.2 ELSE 0.0 END, 4) AS quality
                FROM q JOIN m ON m.doc_id = q.doc_id)
              SELECT doc_id, n_tokens, quality, punct_ratio,
                CASE WHEN n_tokens < 200 THEN 'too_short'
                     WHEN punct_ratio > 0.1 THEN 'noisy'
                     WHEN quality < 0.5 THEN 'low_quality'
                     ELSE 'keep' END AS verdict
              FROM sc ORDER BY doc_id""")),

    // benchmark decontamination: flag corpus docs sharing any word
    // 3-gram with the (broadcast) benchmark set — the pre-training
    // eval-overlap check at corpus scale
    QueryDef("q74_decontaminate",
      (s, d) => {
        val docs = table(s, d, "documents")
        Corpus.decontaminate(
            docs.filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0),
            "doc_id", "text", n = 3)
          .orderBy("doc_id")
      },
      Some(s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
              bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
              cg AS ${shinglesSql("corpus")},
              bg AS (SELECT doc_id AS bench_id, s FROM ${shinglesSql("bench")} b0),
              hits AS (SELECT cg.doc_id, cg.s, bg.bench_id FROM cg JOIN bg ON bg.s = cg.s)
              SELECT doc_id, CAST(COUNT(DISTINCT s) AS BIGINT) AS n_shared_grams,
                MIN(bench_id) AS first_bench_id
              FROM hits GROUP BY doc_id ORDER BY doc_id""")),

    // deterministic stratified sampling: per-language keep-rates from
    // the first hex nibble of md5(lang:doc_id) — map-side, no RNG, no
    // shuffle; reproducible across engines/runs/partitionings
    QueryDef("q75_stratified_sample",
      (s, d) => {
        val nibble = when(col("lang") === "en", "8") // 50%
          .when(col("lang").isin("es", "de"), "4") // 25%
          .otherwise("2") // 12.5%
        table(s, d, "documents")
          .withColumn("__keep", Corpus.sampleFlag(col("lang"), col("doc_id"), nibble))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_total"),
            count(when(col("__keep"), 1)).as("n_sampled"))
          .withColumn("rate", col("n_sampled").cast(DoubleType) / col("n_total"))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n_total,
                CAST(COUNT(CASE WHEN substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 1)
                  < (CASE WHEN lang = 'en' THEN '8'
                          WHEN lang IN ('es','de') THEN '4' ELSE '2' END)
                  THEN 1 END) AS BIGINT) AS n_sampled,
                CAST(COUNT(CASE WHEN substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 1)
                  < (CASE WHEN lang = 'en' THEN '8'
                          WHEN lang IN ('es','de') THEN '4' ELSE '2' END)
                  THEN 1 END) AS DOUBLE) / COUNT(*) AS rate
              FROM documents GROUP BY lang ORDER BY lang""")),

    // hash shard assignment + per-shard manifest stats (the "write N
    // balanced training shards" step; the hash is portable md5 so any
    // engine routes a doc to the same shard)
    QueryDef("q76_shard_assign",
      (s, d) => table(s, d, "documents")
        .select(
          (conv(substring(md5(concat(lit("s:"), col("doc_id").cast(StringType))), 1, 4),
            16, 10).cast(LongType) % 8).as("shard"),
          TextStats.tokenCount(col("text")).as("n_tokens"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy("shard"),
      Some("""SELECT CAST(CAST('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 4)
                  AS INTEGER) % 8 AS BIGINT) AS shard,
                COUNT(*) AS n_docs,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
              FROM documents GROUP BY 1 ORDER BY shard""")),

    // duplicate-cluster resolution: connected components over the LSH
    // candidate-pair graph (same pairs as q36) by iterative min-label
    // propagation; oracle recomputes components with a recursive CTE
    QueryDef("q77_dup_clusters",
      (s, d) => Corpus.duplicateClusters(
          Dedup.lshCandidatePairs(table(s, d, "documents"),
            "doc_id", Dedup.shingles(col("text"), 3), numHashes = 8, rowsPerBand = 2))
        .orderBy("id"),
      Some(s"""WITH RECURSIVE $dupClusterCtes
              SELECT id, cluster FROM clusters ORDER BY id""")),

    // deterministic training-order shuffle: total order by md5(id) —
    // reproducible "randomness", range-partitioned sort + zipWithIndex
    // (no RNG state, no single-partition window)
    QueryDef("q78_interleave",
      (s, d) => Corpus.deterministicShuffle(table(s, d, "documents"), "doc_id")
        .orderBy("pos"),
      Some("""SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1 AS BIGINT)
                  AS pos, doc_id
              FROM documents ORDER BY pos""")),

    // sequence packing (contiguous fill): running token total per
    // language, new bin every 2048 tokens; per-bin manifest stats
    QueryDef("q79_pack_sequences",
      (s, d) => Corpus.packSequences(
          table(s, d, "documents"), "lang", "doc_id",
          TextStats.tokenCount(col("text")), capacity = 2048)
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("bin_tokens"))
        .orderBy("lang", "bin"),
      Some("""WITH t AS (
                SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
                FROM documents),
              c AS (
                SELECT lang, doc_id, tok,
                  CAST(SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                FROM t)
              SELECT lang, CAST((cum - tok) // 2048 AS BIGINT) AS bin, COUNT(*) AS n_docs,
                CAST(SUM(tok) AS BIGINT) AS bin_tokens
              FROM c GROUP BY lang, bin ORDER BY lang, bin""")),

    // the stages composed: quality filter → exact dedup (keep-first) →
    // overlap chunking → per-stratum sequence packing, one declarative
    // plan end to end. Every stage is individually oracle-proven
    // (q73/q33/q71/q79); this verifies they COMPOSE — the raw-corpus →
    // training-shards path as a single Catalyst-optimized query (the
    // optimizer fuses the map-side stages; the only shuffles are the
    // dedup window and the packing window).
    QueryDef("q99_corpus_pipeline",
      (s, d) => {
        val docs = table(s, d, "documents")
        val kept = docs.filter(
          TextStats.tokenCount(col("text")) >= 30 &&
            TextStats.punctRatio(col("text")) <= 0.1)
        val withFp = kept.withColumn("f",
          md5(lower(regexp_replace(col("text"), "\\s+", " "))))
        val ded = Dedup.dedupKeepFirst(withFp, Seq("f"), "doc_id")
        val chunks = Corpus.chunk(ded, "doc_id", "text", chunkTokens = 64, stride = 48)
          .join(ded.select("doc_id", "lang"), "doc_id")
          .select(col("lang"),
            (col("doc_id") * 1000 + col("chunk_id")).as("cid"),
            col("n_chunk_tokens"))
        Corpus.packSequences(chunks, "lang", "cid", col("n_chunk_tokens"), capacity = 2048)
          .groupBy("lang", "bin")
          .agg(count(lit(1)).as("n_chunks"), sum(col("__tok")).as("bin_tokens"))
          .orderBy("lang", "bin")
      },
      Some("""WITH m AS (
                SELECT doc_id, lang, text,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  ROUND(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                    / GREATEST(CAST(length(text) AS DOUBLE), 1.0), 4) AS punct_ratio
                FROM documents),
              kept AS (SELECT doc_id, lang, text FROM m
                       WHERE n_tokens >= 30 AND punct_ratio <= 0.1),
              ded AS (
                SELECT doc_id, lang, text FROM (
                  SELECT doc_id, lang, text, ROW_NUMBER() OVER (
                    PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
                    ORDER BY doc_id) AS rn
                  FROM kept) t
                WHERE rn = 1),
              t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM ded),
              st AS (SELECT doc_id, lang, toks,
                       unnest(range(0, GREATEST(len(toks), 1), 48)) AS start
                     FROM t),
              ch AS (SELECT lang,
                       doc_id * 1000 + CAST(start / 48 AS BIGINT) AS cid,
                       CAST(LEAST(64, len(toks) - start) AS BIGINT) AS tok
                     FROM st),
              c AS (SELECT lang, cid, tok,
                      CAST(SUM(tok) OVER (PARTITION BY lang ORDER BY cid
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                    FROM ch)
              SELECT lang, CAST((cum - tok) // 2048 AS BIGINT) AS bin,
                COUNT(*) AS n_chunks, CAST(SUM(tok) AS BIGINT) AS bin_tokens
              FROM c GROUP BY lang, bin ORDER BY lang, bin"""))
  )
}
