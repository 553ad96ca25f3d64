package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryDef.table

/** Round-13 batch: INCREMENTAL dedup across ingest batches — the
  * missing members of the incremental family (exact dedup has had
  * its anti-join form since q123). A continuously-ingesting pipeline
  * must dedup batch N+1 against everything seen WITHOUT re-reading
  * (let alone re-clustering) the seen corpus:
  *
  *   - q315 semantic: state = centroids + one representative vector
  *     per cell (Dedup.cellRepresentatives — k rows); the arriving
  *     batch pays O(|batch| × k) assignment + O(|batch|) cosines
  *     whatever the seen corpus size.
  *   - q316 MinHash-LSH: state = per-doc signatures + the write-time-
  *     capped (band, sig) → ids index (Dedup.lshIndex); the arriving
  *     batch probes with one hash join and verifies by stored-
  *     signature agreement (Broder's estimator) — seen TEXT is never
  *     re-read. The streaming form is StreamingOps.lshDedupIngest
  *     (op + spec; see its scaladoc for why it is not a suite query).
  *
  * Same determinism discipline as Extras27-31: exact integer
  * outputs, one pinned double expression tree per comparison, total
  * ORDER BY, count-derived sizing mirrored in pure SQL.
  */
object Extras32 {

  /** Left-associated explicit squared-distance sum over the 64-dim
    * embedding — term-for-term the same double additions Spark's
    * `aggregate(zip_with(...), 0D, acc + x)` folds (q304's trick). */
  private def d2Sql(a: String, b: String): String =
    (1 to 64).map(i => s"($a[$i]-$b[$i])*($a[$i]-$b[$i])").mkString(" + ")

  val all: Seq[QueryDef] = Seq(

    // Incremental SemDeDup: the corpus is split by a count-derived
    // boundary into batch 1 (first 3/4 — "already ingested") and
    // batch 2 (last 1/4 — "arriving"). Batch 1 is clustered once
    // (k ~ sqrt(n1) centroids, its per-cell representatives elected
    // and pinned — in production these k-row frames live in a TxLog
    // state table); batch 2 is then deduped against THAT STATE ONLY:
    // nearest-centroid assignment + one cosine against the stored
    // representative per new vector. Batch-1 vectors are never
    // rescanned by the batch-2 stage (the operator's signature takes
    // only the state frames — IncrementalDedupSpec pins the plan-
    // shape independence), which is exactly what makes the op viable
    // on a 100 TB seen corpus. Output: per cell with arrivals, the
    // stored rep, how many arrived, how many the state dropped.
    QueryDef("q315_semantic_dedup_incremental",
      (s, d) => {
        val fv = table(s, d, "embeddings").select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        val n = fv.count()
        val split = 3L * n / 4
        val b1 = fv.filter(col("vec_id") < split)
        val n1 = b1.count()
        val k = math.max(8L, math.ceil(math.sqrt(n1.toDouble)).toLong)
        val cc = b1.filter(col("vec_id") < k)
          .select(col("vec_id").as("cell"), col("v").as("cv"))
        // the persisted state: k rows, pinned = "stored"
        val reps = graft.ops.Dedup
          .cellRepresentatives(b1, cc, "vec_id", "v")
          .transform(graft.ops.Pinned.pin)
        val b2 = fv.filter(col("vec_id") >= split)
        // ONE |batch|×k assignment pass feeding ONE census aggregate:
        // the arrival count and the drop count are conditional sums
        // over the same (assignment ⋈ batch ⋈ broadcast state) rows,
        // so the r17 two-consumer shape (pinned assignment read by a
        // count groupBy AND by the drop stage, then re-joined) folds
        // to a single pass — the drop predicate is exactly
        // Dedup.semanticDupIncrementalFromAssignment's filter chain,
        // evaluated per row as a flag instead of as a filter. The
        // assignment pin went with its second consumer.
        val asg2 = graft.ops.Dedup.assignCells(b2, cc, "vec_id", "v")
        val dropFlag = col("vec_id") =!= col("rep") &&
          graft.functions.VectorExprs.cosineSim(col("v"), col("rep_vec")) >= 0.35
        asg2.join(b2, "vec_id")
          .join(broadcast(reps), Seq("cell"))
          .groupBy("cell", "rep")
          .agg(count(lit(1)).as("n_new"),
            sum(when(dropFlag, 1L).otherwise(0L)).as("n_dropped"))
          .select(col("cell"), col("rep"), col("n_new"), col("n_dropped"),
            (col("n_new") - col("n_dropped")).as("n_kept"))
          .orderBy("cell")
      },
      Some(s"""WITH emb AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
              nn AS (SELECT (3 * COUNT(*)) // 4 AS s FROM embeddings),
              b1 AS (SELECT * FROM emb
                     WHERE vec_id < (SELECT s FROM nn)),
              kk AS (SELECT GREATEST(8,
                       CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) AS k FROM b1),
              cc AS (SELECT vec_id AS cell, v AS cv FROM b1
                     WHERE vec_id < (SELECT k FROM kk)),
              -- d2 computed ONCE in the innermost select, window
              -- orders by the alias (the q311 lesson: inlining the
              -- 64-term sum into the window ORDER BY re-evaluates it
              -- per sort comparison — 30× slower and it churns
              -- jemalloc mappings until vm.max_map_count trips)
              asg1 AS (SELECT vec_id, cell, d2 FROM (
                  SELECT vec_id, cell, d2,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY d2, cell) AS rn
                  FROM (SELECT e.vec_id, cc.cell,
                               ${d2Sql("e.v", "cc.cv")} AS d2
                        FROM b1 e JOIN cc ON TRUE)) WHERE rn = 1),
              reps AS (SELECT cell, vec_id AS rep FROM (
                  SELECT cell, vec_id, ROW_NUMBER() OVER (PARTITION BY cell
                           ORDER BY d2, vec_id) AS rn
                  FROM asg1) WHERE rn = 1),
              b2 AS (SELECT * FROM emb
                     WHERE vec_id >= (SELECT s FROM nn)),
              asg2 AS (SELECT vec_id, cell FROM (
                  SELECT vec_id, cell, d2,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY d2, cell) AS rn
                  FROM (SELECT e.vec_id, cc.cell,
                               ${d2Sql("e.v", "cc.cv")} AS d2
                        FROM b2 e JOIN cc ON TRUE)) WHERE rn = 1),
              drops AS (SELECT a.cell, COUNT(*) AS n_dropped
                        FROM asg2 a JOIN reps r ON r.cell = a.cell
                        JOIN emb m ON m.vec_id = a.vec_id
                        JOIN emb rv ON rv.vec_id = r.rep
                        WHERE a.vec_id <> r.rep
                          AND list_cosine_similarity(m.v, rv.v) >= 0.35
                        GROUP BY a.cell),
              news AS (SELECT cell, COUNT(*) AS n_new FROM asg2 GROUP BY cell)
              SELECT n.cell, r.rep, n.n_new,
                     COALESCE(d.n_dropped, 0) AS n_dropped,
                     n.n_new - COALESCE(d.n_dropped, 0) AS n_kept
              FROM news n JOIN reps r ON r.cell = n.cell
              LEFT JOIN drops d ON d.cell = n.cell
              ORDER BY n.cell""")),

    // Incremental MinHash-LSH near-dup: the LSH member of the
    // incremental family (exact: q123, semantic: q315). The seen 3/4
    // persists TWO compact state tables — the per-doc 8-minhash
    // signature frame and the (band, sig) -> member-ids index with
    // hot signatures dropped at write time (cap 64: a signature
    // shared by >64 docs is a stop-phrase, and capping at write time
    // bounds every FUTURE probe's fan-out). The arriving 1/4 bands
    // its own signatures, probes the index with one (band, sig) hash
    // join, and verifies candidates against the stored SIGNATURES,
    // never the seen text: n_match (0..8 agreeing minhashes) is the
    // unbiased Jaccard estimate k*J. Cross-split pairs only by
    // construction; n_match >= 2 is implied by any band collision
    // (rowsPerBand = 2), so the gate exercises the estimator while
    // dropping hash-tie accidents.
    QueryDef("q316_lsh_dedup_incremental",
      (s, d) => {
        val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
        val n = docs.count()
        val split = 3L * n / 4
        val sh = graft.ops.Dedup.shingles(col("text"), 3)
        // stored state: per-doc signatures + write-time-capped index
        val sigs1 = graft.ops.Dedup
          .minhashSignatures(docs.filter(col("doc_id") < split), "doc_id", sh, 8)
          .transform(graft.ops.Pinned.pin)
        // the index derives deterministically from the PINNED sigs1
        // (one banding explode + one groupBy) and has exactly one
        // consumer — the probe join. A single-consumer checkpoint
        // buys zero reuse and costs a scheduler barrier (the q272
        // precedent); the state boundary that guarantees the seen
        // text is never re-read is sigs1's pin, which stays.
        val index = graft.ops.Dedup.lshIndex(
            graft.ops.Dedup.lshBandsFromSignatures(sigs1, "doc_id", 8, 2),
            "doc_id", maxIdsPerSig = 64)
        // arriving batch: one signature pass, read by band + verify
        val sigs2 = graft.ops.Dedup
          .minhashSignatures(docs.filter(col("doc_id") >= split), "doc_id", sh, 8)
          .transform(graft.ops.Pinned.pin)
        graft.ops.Dedup.lshDupIncremental(sigs2, sigs1, index,
            "doc_id", numHashes = 8, rowsPerBand = 2, minMatches = 2)
          .orderBy("new_id", "seen_id")
      },
      Some {
        val mhs = (0 until 8).map(i => s"MIN(md5('$i:' || s)) AS mh$i").mkString(", ")
        val nm = (0 until 8).map(i =>
          s"(CASE WHEN x.mh$i = y.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH nn AS (SELECT (3 * COUNT(*)) // 4 AS s FROM documents),
            ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            shg AS (SELECT DISTINCT doc_id, s FROM
              (SELECT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s FROM
                (SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 1, 2))) AS i FROM ws) t1) t2),
            sg AS (SELECT doc_id, $mhs FROM shg GROUP BY doc_id),
            sg1 AS (SELECT * FROM sg WHERE doc_id < (SELECT s FROM nn)),
            sg2 AS (SELECT * FROM sg WHERE doc_id >= (SELECT s FROM nn)),
            bands1 AS (
              SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS sig FROM sg1 UNION ALL
              SELECT doc_id, 1 AS band, md5(mh2 || mh3) AS sig FROM sg1 UNION ALL
              SELECT doc_id, 2 AS band, md5(mh4 || mh5) AS sig FROM sg1 UNION ALL
              SELECT doc_id, 3 AS band, md5(mh6 || mh7) AS sig FROM sg1),
            -- write-time hot-signature cap on the stored index
            idx AS (SELECT band, sig FROM bands1
                    GROUP BY band, sig HAVING COUNT(*) <= 64),
            bands1c AS (SELECT b.* FROM bands1 b JOIN idx USING (band, sig)),
            bands2 AS (
              SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS sig FROM sg2 UNION ALL
              SELECT doc_id, 1 AS band, md5(mh2 || mh3) AS sig FROM sg2 UNION ALL
              SELECT doc_id, 2 AS band, md5(mh4 || mh5) AS sig FROM sg2 UNION ALL
              SELECT doc_id, 3 AS band, md5(mh6 || mh7) AS sig FROM sg2),
            cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS seen_id
                     FROM bands2 a JOIN bands1c b
                       ON a.band = b.band AND a.sig = b.sig
                      AND a.doc_id <> b.doc_id)
            SELECT c.new_id, c.seen_id, CAST($nm AS BIGINT) AS n_match
            FROM cand c JOIN sg2 x ON x.doc_id = c.new_id
                        JOIN sg1 y ON y.doc_id = c.seen_id
            WHERE $nm >= 2
            ORDER BY c.new_id, c.seen_id"""
      })
  )
}
