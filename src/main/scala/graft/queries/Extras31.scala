package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import QueryDef.table

/** Round-12 batch: the count-derived SemDeDup regime router gated on
  * BOTH sides of its threshold (q311 exact / q312 pruned — the same
  * corpus, two thresholds, so the driver verifies that crossing the
  * ceiling flips the plan without changing the contract), and the
  * multimodal perceptual-hash near-dup pass (q313) — the image
  * analogue of q128's text LSH. Same determinism discipline as
  * Extras27-30: exact integer accumulators, one pinned double
  * expression tree per row where floats are unavoidable, total ORDER
  * BY everywhere, sizing constants derived from corpus counts with
  * pure-SQL mirrors.
  */
object Extras31 {

  /** Left-associated explicit squared-distance sum over the 64-dim
    * embedding — term-for-term the same double additions Spark's
    * `aggregate(zip_with(...), 0D, acc + x)` folds (q304's trick). */
  private def d2Sql(a: String, b: String): String =
    (1 to 64).map(i => s"($a[$i]-$b[$i])*($a[$i]-$b[$i])").mkString(" + ")

  /** One routed-SemDeDup gate at an explicit regime ceiling.
    *
    * The router (`Dedup.semanticDup`) picks the exact within-cell
    * all-pairs form under the ceiling and the linear per-cell-
    * representative form above it; the quantizer sizing follows the
    * regime the same way (pair-bound k ~ sqrt(n) while exact,
    * assignment-bound k ~ n^(1/4) once pruned — k stops being a
    * pair-count bound the moment the pair stage is linear). The two
    * instantiations pin ceilings on either side of the test corpus
    * count, so BOTH regimes are driver-verified at sf0.01 and the
    * q311 gate itself flips exact→pruned between sf0.01 (500 rows)
    * and sf0.1 (2000): the threshold crossing is data, not a code
    * path the oracle can't reach. The `regime` output column makes
    * the active side part of the hash-verified contract.
    */
  private def routedGate(name: String, ceiling: Long): QueryDef =
    QueryDef(name,
      (s, d) => {
        val fv = table(s, d, "embeddings").select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        val n = fv.count()
        val exact = n <= ceiling
        val k =
          if (exact) math.max(8L, math.ceil(math.sqrt(n.toDouble)).toLong)
          else math.max(8L, math.ceil(math.sqrt(
            math.ceil(math.sqrt(n.toDouble)))).toLong)
        val cc = fv.filter(col("vec_id") < k)
          .select(col("vec_id").as("cell"), col("v").as("cv"))
        // ONE n×k assignment pass, pinned — census and pair stage
        // both read it (q273's documented pattern)
        val asg = graft.ops.Dedup.assignCellsWithDist(fv, cc, "vec_id", "v")
          .transform(graft.ops.Pinned.pin)
        val drops = graft.ops.Dedup
          .semanticDupFromAssignment(fv, asg, "vec_id", "v",
            tau = 0.35, corpusCount = n, exactMaxRows = ceiling)
          .groupBy("cell").agg(count(lit(1)).as("n_dropped"))
        asg.groupBy("cell").agg(count(lit(1)).as("n_docs"))
          .join(drops, Seq("cell"), "left")
          .na.fill(0L, Seq("n_dropped"))
          .select(col("cell"),
            lit(if (exact) "exact" else "pruned").as("regime"),
            col("n_docs"), col("n_dropped"),
            (col("n_docs") - col("n_dropped")).as("n_kept"))
          .orderBy("cell")
      },
      Some(s"""WITH emb AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
              nn AS (SELECT COUNT(*) AS n FROM embeddings),
              cc AS (SELECT vec_id AS cell, v AS cv FROM emb
                     WHERE vec_id < (SELECT CASE WHEN n <= $ceiling
                         THEN GREATEST(8, CAST(CEIL(SQRT(n)) AS BIGINT))
                         ELSE GREATEST(8, CAST(CEIL(SQRT(
                             CEIL(SQRT(n)))) AS BIGINT)) END FROM nn)),
              -- d2 is computed ONCE in the innermost select and the
              -- window orders by the ALIAS: inlining the 64-term
              -- expression into the window ORDER BY makes DuckDB
              -- re-evaluate it during sort comparisons — measured 30×
              -- slower AND ~50k transient jemalloc mappings, enough
              -- to trip vm.max_map_count in a long oracle batch
              asg AS (SELECT vec_id, cell, d2 FROM (
                  SELECT vec_id, cell, d2,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY d2, cell) AS rn
                  FROM (SELECT e.vec_id, cc.cell,
                               ${d2Sql("e.v", "cc.cv")} AS d2
                        FROM emb e JOIN cc ON TRUE)) WHERE rn = 1),
              reps AS (SELECT cell, vec_id AS rep FROM (
                  SELECT cell, vec_id, ROW_NUMBER() OVER (PARTITION BY cell
                           ORDER BY d2, vec_id) AS rn
                  FROM asg) WHERE rn = 1),
              -- regime gates applied to the JOIN INPUTS, not the join
              -- output: the inactive regime's relation is empty before
              -- any pairing happens, so the planner can never evaluate
              -- the dead branch's quadratic join (a WHERE-side guard
              -- left it running the all-pairs scan just to filter it)
              exa AS (SELECT * FROM asg
                      WHERE (SELECT n FROM nn) <= $ceiling),
              pra AS (SELECT * FROM asg
                      WHERE (SELECT n FROM nn) > $ceiling),
              exd AS (SELECT DISTINCT a.cell, b.vec_id AS drop_id
                      FROM exa a JOIN exa b
                        ON a.cell = b.cell AND a.vec_id < b.vec_id
                      JOIN emb e1 ON e1.vec_id = a.vec_id
                      JOIN emb e2 ON e2.vec_id = b.vec_id
                      WHERE list_cosine_similarity(e1.v, e2.v) >= 0.35),
              prd AS (SELECT DISTINCT a.cell, a.vec_id AS drop_id
                      FROM pra a JOIN reps r ON a.cell = r.cell
                      JOIN emb m ON m.vec_id = a.vec_id
                      JOIN emb rv ON rv.vec_id = r.rep
                      WHERE a.vec_id <> r.rep
                        AND list_cosine_similarity(m.v, rv.v) >= 0.35),
              drops AS (SELECT cell, COUNT(*) AS n_dropped FROM
                          (SELECT * FROM exd UNION ALL SELECT * FROM prd)
                        GROUP BY cell),
              docs AS (SELECT cell, COUNT(*) AS n_docs FROM asg GROUP BY 1)
              SELECT d.cell,
                     (SELECT CASE WHEN n <= $ceiling THEN 'exact'
                             ELSE 'pruned' END FROM nn) AS regime,
                     d.n_docs, COALESCE(dr.n_dropped, 0) AS n_dropped,
                     d.n_docs - COALESCE(dr.n_dropped, 0) AS n_kept
              FROM docs d LEFT JOIN drops dr ON dr.cell = d.cell
              ORDER BY d.cell"""))

  val all: Seq[QueryDef] = Seq(

    // Routed SemDeDup, ceiling ABOVE the sf0.01 corpus (500 ≤ 1024 →
    // exact regime there; the sf0.1 corpus (2000) crosses it → pruned).
    routedGate("q311_semantic_dedup_routed", ceiling = 1024L),

    // Same router, ceiling BELOW every test corpus (256 < 500) — the
    // pruned side of the switch is driver-verified at sf0.01 too.
    routedGate("q312_semantic_dedup_routed_big", ceiling = 256L),

    // Multimodal near-dup by PERCEPTUAL hash — the image analogue of
    // q128's text LSH (a training-data pipeline dedups images too).
    // aHash (average hash), the classic perceptual-hash family's
    // simplest member, over the stubbed byte-as-pixel decode the
    // multimodal family already uses (q44/q45/q181: the corpus'
    // ASCII text doubles as the binary payload, so the oracle can
    // replay the codec exactly): the payload is cut into 60 equal
    // strips (the "downsampled image"), each strip's bit = 1 iff its
    // mean byte exceeds the whole payload's mean — cross-multiplied
    // integers (ss*tc > ts*sc), no division — giving a 60-bit hash
    // that tolerates small local edits where md5 flips completely.
    // (60 bits, not 64: the DuckDB mirror errors on a shift into the
    // sign bit, and 60 = 4×15 keeps every band value positive in
    // both engines — no signed-shift mirroring traps.)
    // Near-dups go through Dedup.hammingNearDupPairs: 4 bands × 15
    // bits, so by pigeonhole ANY pair within Hamming ≤ 3 shares an
    // intact band — genuinely exact recall for the ≤3 gate (the
    // round-12 2×16 banding claimed this but dropped 2+1 flip
    // splits; 4 bands is the smallest count that covers 3 flips),
    // then exact bit_count(xor) ≤ 3 verification on candidates only.
    // BYTE-IDENTICAL payloads collapse to their min-id
    // representative FIRST (content-md5 group, the same stage a
    // production image pipeline runs before perceptual matching):
    // exact duplicates are the exact-dedup operator's job (q33), and
    // without the collapse an N-way identical payload fills its
    // perceptual bucket with N copies whose N²/2 pairwise
    // verifications say nothing banding's cap should have to absorb.
    // Scale: the collapse is two (md5,id)-keyed linear shuffles;
    // strip stats are linear in bytes and map-side; the only other
    // shuffles are the per-doc hash agg and the (band,key)-bucket
    // join; q129's hot-key contract (drop buckets > 64 docs: a hash
    // that common among DISTINCT payloads is a blank/solid-color
    // template, not a near-dup signal) bounds pair expansion at
    // 2016 pairs per bucket at ANY corpus size; 15-bit bands give
    // 32768 buckets per band, so average occupancy stays ~n/32768.
    // GATE SEEDS: the natural corpus yields ~1 qualifying pair at
    // sf0.01, so a regression that silently dropped ALL pairs would
    // hash-match an (almost) empty oracle. Eight deterministic
    // near-dup twins ([[mutMidChar]] of the 8 smallest qualifying
    // docs, NEGATIVE ids so they can never collide with corpus ids
    // at any SF) ride along with the FULL natural corpus through the
    // unchanged production parameters — the gate now verifies tens
    // of real pairs at every scale while still covering whatever
    // natural pairs exist.
    QueryDef("q313_phash_near_dup",
      (s, d) => {
        val docs = table(s, d, "documents").select(col("doc_id"), col("text"))
        val seeds = docs
          .withColumn("n", length(col("text")).cast(LongType))
          .filter(col("n") >= 60)
          .orderBy("doc_id").limit(8)
          .select((-col("doc_id") - 1).as("doc_id"), mutMidChar.as("text"))
        phashPairs(aHash60(docs.unionAll(seeds)))
      },
      Some(s"""WITH sbase AS (SELECT doc_id, text,
                       CAST(length(text) AS BIGINT) AS n
                   FROM documents WHERE length(text) >= 60
                   ORDER BY doc_id LIMIT 8),
              seeded AS (SELECT doc_id, text FROM documents
                UNION ALL
                SELECT -doc_id - 1 AS doc_id, $mutMidCharSql AS text
                FROM sbase),
              ${aHashSql("seeded")}
              SELECT id1, id2, hamming FROM pairs
              ORDER BY id1, id2""")),

    // Near-dup-RICH pHash gate: the natural corpus yields ~1 q313
    // pair at sf0.01, so the banding/cap/collapse machinery was
    // barely exercised by the driver. This variant SEEDS near-dups
    // deterministically — the 32 smallest qualifying docs each get a
    // mutated twin (one mid-payload character replaced by a
    // deterministic different character: chr(33 + (ascii+13) mod 94)
    // never maps a printable byte to itself) — and runs the same
    // pipeline over original ∪ mutants. A one-byte edit moves one
    // strip mean and the global mean by ≤93/n, so most twins land
    // within Hamming 0–3 (margin-dependent, hash-verified either
    // way): the gate exercises tens of pairs across all four bands,
    // including multi-band flip splits the 2-band design missed.
    // Top-k by doc_id (TakeOrderedAndProject — no global window) so
    // the seeded frame is O(1)-sized at ANY corpus scale.
    QueryDef("q314_phash_near_dup_seeded",
      (s, d) => {
        val base = table(s, d, "documents")
          .select(col("doc_id"), col("text"),
            length(col("text")).cast(LongType).as("n"))
          .filter(col("n") >= 60)
          .orderBy("doc_id").limit(32)
        val variants = base.select(explode(array(
            struct((col("doc_id") * 2).as("doc_id"), col("text").as("text")),
            struct((col("doc_id") * 2 + 1).as("doc_id"), mutMidChar.as("text"))))
            .as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
        phashPairs(aHash60(variants))
      },
      Some(s"""WITH base AS (SELECT doc_id, text,
                       CAST(length(text) AS BIGINT) AS n
                   FROM documents WHERE length(text) >= 60
                   ORDER BY doc_id LIMIT 32),
              vsrc AS (
                SELECT doc_id * 2 AS doc_id, text FROM base
                UNION ALL
                SELECT doc_id * 2 + 1 AS doc_id,
                       $mutMidCharSql AS text
                FROM base),
              ${aHashSql("vsrc")}
              SELECT id1, id2, hamming FROM pairs
              ORDER BY id1, id2"""))
  )

  /** Deterministic one-character mid-payload mutation over (text, n)
    * columns — chr(33 + (ascii+13) mod 94) never maps a printable
    * byte to itself, so the twin is a GENUINE near-dup (typically
    * Hamming 0-3 of the original's aHash: one strip mean and the
    * global mean move by <= 93/n). Shared by q313's gate seeds,
    * q314's seeded variant, and q317's arriving-batch twins. */
  // defs, not vals: `all` above initializes EAGERLY at object load
  // and interpolates these into oracle SQL — a val declared after
  // `all` would still be null at that point (a "null" literal
  // silently lands in the SQL; the gate catches it as duck=0 rows,
  // but only because the gate is non-empty — which is the point of
  // this round's q313 seeding).
  private[queries] def mutMidChar = expr(
    "concat(substring(text, 1, CAST(n div 2 AS INT) - 1), " +
      "chr(33 + ((ascii(substring(text, CAST(n div 2 AS INT), 1)) + 13) % 94)), " +
      "substring(text, CAST(n div 2 AS INT) + 1))")

  /** DuckDB mirror of [[mutMidChar]]. */
  private[queries] def mutMidCharSql: String =
    "substr(text, 1, CAST(n // 2 AS INT) - 1) || " +
      "chr(33 + ((ascii(substr(text, CAST(n // 2 AS INT), 1)) + 13) % 94)) || " +
      "substr(text, CAST(n // 2 AS INT) + 1)"

  /** Shared aHash stage for q313/q314/q317 over a (doc_id, text)
    * payload frame: md5-collapse byte-identical payloads to their
    * min-id representative, then the 60-strip average hash. Returns
    * one narrow (doc_id, ah) row per surviving payload of >= 60
    * chars.
    *
    * The hash itself is [[graft.functions.AHash60]] — a native
    * codegen expression doing one tight loop over the payload's
    * bytes (round 15; the previous split("")+posexplode+groupBy+
    * window pipeline materialized one ROW PER CHARACTER through an
    * aggregate and a window — measured ~2.8 s of q317's 3.9 s at
    * sf0.1 across its two hash passes, vs ~0.1 s for the
    * expression). Bit-identical: same (p * 60) div n strip, same
    * cross-multiplied integer mean comparison, code-point iteration
    * exactly as the oracle's substr/ascii positions.
    */
  private[queries] def aHash60(payloads: DataFrame): DataFrame = {
    val docs0 = payloads
      .select(col("doc_id"), col("text"),
        length(col("text")).cast(LongType).as("n"))
      .filter(col("n") >= 60) // one full strip minimum apiece
    val keep = docs0
      .select(col("doc_id"), md5(col("text")).as("f"))
      .groupBy("f").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs0.join(keep, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.functions.AHash.ahash60(col("text")).as("ah"))
  }

  /** The banding+verify half, shared by q313/q314: pin the narrow
    * per-doc hash frame (the op reads it three times — banding plus
    * both verify joins — and would otherwise re-run the
    * scan→collapse→char-explode→window lineage each time; measured
    * 22 s vs ~6 s at the 64× replica), then 4×15 banding with exact
    * Hamming ≤ 3 verification. */
  private def phashPairs(hashes: DataFrame): DataFrame =
    graft.ops.Dedup.hammingNearDupPairs(
        hashes.transform(graft.ops.Pinned.pin), "doc_id", "ah",
        bits = 15, bands = 4, maxHamming = 3, maxBucketSize = 64)
      .orderBy("id1", "id2")

  /** DuckDB mirror of [[aHash60]] ALONE over source relation `src`,
    * every intermediate relation prefixed `p` — a WITH-clause body
    * ending in `${p}hashes(doc_id, ah)`. Factored out so queries
    * that hash TWO payload frames (q317's seen/arriving splits)
    * instantiate it twice without relation-name collisions. */
  private[queries] def aHashHashesSql(src: String, p: String): String =
    s"""${p}docs0 AS (SELECT doc_id, text,
                       CAST(length(text) AS BIGINT) AS n
                   FROM $src WHERE length(text) >= 60),
              ${p}canon AS (SELECT MIN(doc_id) AS doc_id
                        FROM ${p}docs0 GROUP BY md5(text)),
              ${p}docs AS (SELECT d.* FROM ${p}docs0 d
                        JOIN ${p}canon USING (doc_id)),
              ${p}strips AS (
                SELECT doc_id, (CAST(t.i - 1 AS BIGINT) * 60) // n AS strip,
                       CAST(SUM(ascii(substr(text, t.i, 1))) AS BIGINT) AS ss,
                       CAST(COUNT(*) AS BIGINT) AS sc
                FROM ${p}docs, UNNEST(generate_series(1, CAST(n AS INT))) AS t(i)
                GROUP BY doc_id, strip),
              ${p}hashes AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN ss * tc > ts * sc THEN
                         CAST(1 AS BIGINT) << CAST(strip AS INT)
                         ELSE 0 END) AS BIGINT) AS ah
                FROM (SELECT doc_id, strip, ss, sc,
                             SUM(ss) OVER (PARTITION BY doc_id) AS ts,
                             SUM(sc) OVER (PARTITION BY doc_id) AS tc
                      FROM ${p}strips)
                GROUP BY doc_id)"""

  /** The 4×15 band cut of a `(doc_id, ah)` relation — mirror of
    * `Dedup.hammingBands` at the q313 geometry. Band values and the
    * hash itself stay under the sign bit (60 = 4×15), so no
    * signed-shift semantics are in play in either engine. */
  private[queries] def hammingBandsSql(hashesRel: String, out: String): String =
    s"""$out AS (
                SELECT doc_id, 0 AS band, ah & 32767 AS sig FROM $hashesRel
                UNION ALL
                SELECT doc_id, 1 AS band, (ah >> 15) & 32767 AS sig FROM $hashesRel
                UNION ALL
                SELECT doc_id, 2 AS band, (ah >> 30) & 32767 AS sig FROM $hashesRel
                UNION ALL
                SELECT doc_id, 3 AS band, (ah >> 45) & 32767 AS sig FROM $hashesRel)"""

  /** DuckDB mirror of [[aHash60]] + the 4×15 banding over source
    * relation `src` — a WITH-clause body ending in `pairs(id1, id2,
    * hamming)`. */
  private def aHashSql(src: String): String =
    s"""${aHashHashesSql(src, "")},
              ${hammingBandsSql("hashes", "bands")},
              keep AS (SELECT band, sig FROM (
                         SELECT band, sig, COUNT(*) AS c
                         FROM bands GROUP BY 1, 2)
                       WHERE c BETWEEN 2 AND 64),
              kb AS (SELECT b.* FROM bands b JOIN keep k
                       ON k.band = b.band AND k.sig = b.sig),
              cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                       FROM kb a JOIN kb b
                         ON a.band = b.band AND a.sig = b.sig
                            AND a.doc_id < b.doc_id),
              pairs AS (
                SELECT c.id1, c.id2,
                       CAST(bit_count(xor(h1.ah, h2.ah)) AS BIGINT) AS hamming
                FROM cand c
                JOIN hashes h1 ON h1.doc_id = c.id1
                JOIN hashes h2 ON h2.doc_id = c.id2
                WHERE bit_count(xor(h1.ah, h2.ah)) <= 3)"""
}
