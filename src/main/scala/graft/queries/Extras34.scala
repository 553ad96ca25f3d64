package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import QueryDef.table

/** Round-15 batch: the MOSS member of the incremental-dedup family
  * (exact: q123, semantic: q315, MinHash-LSH: q316, perceptual-hash:
  * q317). A continuously-ingesting corpus must detect fingerprint
  * overlap against everything already seen WITHOUT re-fingerprinting
  * — let alone re-reading — the seen text: state = the seen docs'
  * selected winnowing fingerprints (Schleimer-Wilkerson-Aiken, SIGMOD
  * 2003 — q305's selection, one window pass) plus the write-time-
  * capped fingerprint → ids index; the arriving batch fingerprints
  * only itself and probes with ONE hash join
  * (`Dedup.fingerprintDupIncremental`). Fingerprint equality IS the
  * verification (a shared fingerprint is a shared >= 6-token run by
  * construction), so there is no second verify join at all. Same
  * determinism discipline as Extras27-33: exact integer outputs,
  * total ORDER BY, count-derived split mirrored in SQL.
  */
object Extras34 {

  /** DuckDB mirror of the gram + winnow-selection stage over source
    * relation `src` (doc_id, text): emits `<pfx>grams` and the
    * selected distinct fingerprint set `<pfx>fps(doc_id, h)`. The
    * tie-INCLUSIVE window form (q310's oracle shape) — the distinct
    * fingerprint SET is identical to the Spark side's rightmost-tie
    * selection, each window contributing exactly its min hash. */
  private def winnowFpsSql(src: String, pfx: String): String =
    s"""${pfx}tokd AS (SELECT doc_id, string_split(text, ' ') AS toks,
                       CAST(len(string_split(text, ' ')) - 2 AS BIGINT) AS ng
                   FROM $src
                   WHERE len(string_split(text, ' ')) - 2 >= 4),
              ${pfx}grams AS (
                SELECT doc_id, ng, CAST(t.i AS BIGINT) AS p,
                       md5(array_to_string(toks[t.i:t.i+2], ' ')) AS h
                FROM ${pfx}tokd,
                     UNNEST(generate_series(1, CAST(ng AS INT))) AS t(i)),
              ${pfx}x AS (
                SELECT doc_id, p - t.off AS w, p, h
                FROM ${pfx}grams, UNNEST([0,1,2,3]) AS t(off)
                WHERE p - t.off >= 1 AND p - t.off <= ng - 3),
              ${pfx}wins AS (SELECT doc_id, w, MIN(h) AS wmin
                       FROM ${pfx}x GROUP BY doc_id, w),
              ${pfx}fps AS (SELECT DISTINCT x.doc_id, x.h
                     FROM ${pfx}x x JOIN ${pfx}wins wins
                       ON x.doc_id = wins.doc_id AND x.w = wins.w
                     WHERE x.h = wins.wmin)"""

  val all: Seq[QueryDef] = Seq(

    // Incremental winnowing-fingerprint near-dup: the corpus splits
    // at a count-derived boundary into the seen 3/4 (fingerprinted
    // ONCE into the state tables — in production they live in TxLog
    // tables like q316's) and the arriving 1/4. Because natural
    // cross-split fingerprint overlap is sparse at small SFs, the
    // arriving batch also carries 16 deterministic near-dup twins of
    // the smallest qualifying SEEN docs (mutMidChar, NEGATIVE ids —
    // never colliding with corpus ids at any SF): a one-character
    // edit perturbs only the ~3 grams containing it, so a twin
    // shares most of its original's selected fingerprints and the
    // gate verifies tens of genuine cross-split pairs at every
    // scale, while production parameters stay q305/q310's (3-token
    // grams, w=4 windows, hot cap 64, MOSS match strength >= 2).
    // Plan-shape independence from the seen-corpus size is pinned by
    // IncrementalWinnowSpec; the probe is one hash equi-join on the
    // fingerprint + one count aggregate — never a pairwise scan,
    // never a seen-text re-read, no verify join at all (fingerprint
    // equality is the evidence).
    QueryDef("q318_winnow_dedup_incremental",
      (s, d) => {
        val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
        val n = docs.count()
        val splitAt = 3L * n / 4
        def gramsOf(df: DataFrame): DataFrame = {
          val tokd = df.select(col("doc_id"), split(col("text"), " ").as("toks"))
            .withColumn("ng", (size(col("toks")) - 2).cast(LongType))
            .filter(col("ng") >= 4)
          tokd.select(col("doc_id"), col("ng"), posexplode(
              expr("transform(sequence(1, CAST(ng AS INT)), " +
                "i -> md5(concat_ws(' ', slice(toks, i, 3))))")))
            .select(col("doc_id"), col("ng"),
              (col("pos") + 1).cast(LongType).as("p"), col("col").as("h"))
        }
        def fpsOf(df: DataFrame): DataFrame =
          graft.ops.Dedup.winnowSelect(gramsOf(df), "doc_id", w = 4)
            .select(col("doc_id"), lit(0).as("band"), col("h").as("sig"))
            .distinct()
        val seenSrc = docs.filter(col("doc_id") < splitAt)
        // stored state: selected fingerprints -> write-time-capped
        // fingerprint index (band constant — one fingerprint space —
        // so q316's index/shard/merge-probe machinery is shared)
        val index = graft.ops.Dedup.lshIndex(fpsOf(seenSrc),
            "doc_id", maxIdsPerSig = 64)
          .transform(graft.ops.Pinned.pin)
        // arriving batch: natural 1/4 + 16 seeded twins of seen docs
        val twins = seenSrc
          .withColumn("n", length(col("text")).cast(LongType))
          .filter(col("n") >= 60)
          .orderBy("doc_id").limit(16)
          .select((-col("doc_id") - 1).as("doc_id"),
            Extras31.mutMidChar.as("text"))
        val newFps =
          fpsOf(docs.filter(col("doc_id") >= splitAt).unionAll(twins))
        graft.ops.Dedup.fingerprintDupIncremental(newFps, index,
            "doc_id", minShared = 2)
          .orderBy("new_id", "seen_id")
      },
      Some(s"""WITH nn AS (SELECT (3 * COUNT(*)) // 4 AS s FROM documents),
              seen_src AS (SELECT doc_id, text FROM documents
                           WHERE doc_id < (SELECT s FROM nn)),
              tw AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
                     FROM seen_src WHERE length(text) >= 60
                     ORDER BY doc_id LIMIT 16),
              arr_src AS (SELECT doc_id, text FROM documents
                          WHERE doc_id >= (SELECT s FROM nn)
                UNION ALL
                SELECT -doc_id - 1 AS doc_id,
                       ${Extras31.mutMidCharSql} AS text
                FROM tw),
              ${winnowFpsSql("seen_src", "s_")},
              ${winnowFpsSql("arr_src", "a_")},
              idx AS (SELECT h FROM s_fps
                      GROUP BY h HAVING COUNT(*) <= 64),
              s_kept AS (SELECT f.* FROM s_fps f JOIN idx USING (h))
              SELECT a.doc_id AS new_id, b.doc_id AS seen_id,
                     CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM a_fps a JOIN s_kept b
                ON a.h = b.h AND a.doc_id <> b.doc_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 2
              ORDER BY new_id, seen_id"""))
  )
}
