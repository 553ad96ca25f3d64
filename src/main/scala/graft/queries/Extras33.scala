package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import QueryDef.table

/** Round-14 batch: the MULTIMODAL member of the incremental-dedup
  * family (exact: q123, semantic: q315, MinHash-LSH: q316). A
  * continuously-ingesting image pipeline must near-dup an arriving
  * batch against every perceptual hash already seen WITHOUT
  * re-reading — let alone re-hashing — the seen payload bytes:
  * state = the per-media 60-bit hash table (8 bytes a row) plus the
  * write-time-capped (band, sig) → ids index from the same 4×15
  * banding q313 buckets on; the arriving batch probes with ONE
  * (band, sig) hash join and verifies `bit_count(xor) <= 3` against
  * the stored hashes (`Dedup.hammingDupIncremental`). Pigeonhole
  * recall is exact (maxHamming 3 < 4 bands, required in code), so
  * the incremental path finds every pair the batch op would have.
  * Same determinism discipline as Extras27-32: exact integer
  * outputs, total ORDER BY, count-derived split mirrored in SQL.
  */
object Extras33 {

  val all: Seq[QueryDef] = Seq(

    // Incremental pHash near-dup: the corpus splits at a count-
    // derived boundary into the seen 3/4 (hashed ONCE into the two
    // state tables — in production they live in TxLog tables like
    // q316's) and the arriving 1/4. Because natural cross-split
    // near-pairs are as scarce as q313's (~1 at sf0.01), the
    // arriving batch also carries 16 deterministic near-dup twins of
    // the smallest qualifying SEEN docs (mutMidChar, NEGATIVE ids —
    // never colliding with corpus ids at any SF), so the gate
    // verifies tens of genuine cross-split pairs at every scale
    // while production parameters stay q313's (4×15 bands, Hamming
    // <= 3, hot-bucket cap 64). Plan-shape independence from the
    // seen-corpus size is pinned by IncrementalPhashSpec; the probe
    // is one broadcast-or-hash equi-join on (band, sig) + one
    // 8-byte-hash verify join — never a pairwise scan, never a
    // payload re-read.
    QueryDef("q317_phash_dedup_incremental",
      (s, d) => {
        val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
        val n = docs.count()
        val split = 3L * n / 4
        val seenSrc = docs.filter(col("doc_id") < split)
        // stored state: per-media hashes + write-time-capped index
        val seenHashes = Extras31.aHash60(seenSrc)
          .transform(graft.ops.Pinned.pin)
        // single-consumer index: derives from the PINNED seenHashes
        // (band explode + groupBy) and is read once by the probe
        // join — the checkpoint bought no reuse, only a barrier
        // (q272 precedent). seenHashes' pin stays the state boundary:
        // seen text is still hashed exactly once.
        val index = graft.ops.Dedup.lshIndex(
            graft.ops.Dedup.hammingBands(seenHashes, "doc_id", "ah",
              bits = 15, bands = 4),
            "doc_id", maxIdsPerSig = 64)
        // arriving batch: natural 1/4 + 16 seeded twins of seen docs
        val twins = seenSrc
          .withColumn("n", length(col("text")).cast(LongType))
          .filter(col("n") >= 60)
          .orderBy("doc_id").limit(16)
          .select((-col("doc_id") - 1).as("doc_id"),
            Extras31.mutMidChar.as("text"))
        val newHashes = Extras31
          .aHash60(docs.filter(col("doc_id") >= split).unionAll(twins))
          .transform(graft.ops.Pinned.pin)
        graft.ops.Dedup.hammingDupIncremental(newHashes, seenHashes,
            index, "doc_id", "ah", bits = 15, bands = 4, maxHamming = 3)
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
              ${Extras31.aHashHashesSql("seen_src", "s_")},
              ${Extras31.aHashHashesSql("arr_src", "a_")},
              ${Extras31.hammingBandsSql("s_hashes", "s_bands")},
              idx AS (SELECT band, sig FROM s_bands
                      GROUP BY band, sig HAVING COUNT(*) <= 64),
              s_kb AS (SELECT b.* FROM s_bands b JOIN idx USING (band, sig)),
              ${Extras31.hammingBandsSql("a_hashes", "a_bands")},
              cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS seen_id
                       FROM a_bands a JOIN s_kb b
                         ON a.band = b.band AND a.sig = b.sig
                        AND a.doc_id <> b.doc_id)
              SELECT c.new_id, c.seen_id,
                     CAST(bit_count(xor(h1.ah, h2.ah)) AS BIGINT) AS hamming
              FROM cand c JOIN a_hashes h1 ON h1.doc_id = c.new_id
                          JOIN s_hashes h2 ON h2.doc_id = c.seen_id
              WHERE bit_count(xor(h1.ah, h2.ah)) <= 3
              ORDER BY new_id, seen_id"""))
  )
}
