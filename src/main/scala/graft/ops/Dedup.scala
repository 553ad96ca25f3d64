package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for corpus-scale pipelines.
  *
  * Scale design notes (the part that matters at 100 TB):
  *  - Exact dedup never compares documents pairwise: it hashes every
  *    document to a 128-bit fingerprint ONCE (map-side, codegen'd),
  *    then resolves keepers with a single hash aggregation — one
  *    shuffle on the fingerprint, partial aggregation upstream.
  *  - MinHash signatures are computed per-row with array expressions
  *    (no explode → no pre-shuffle blowup); only the tiny
  *    (doc_id, band, signature) tuples shuffle for the LSH bucket
  *    join, never the document text.
  *  - Candidate pairs come from equi-joins on (band, signature) —
  *    hash-join-able and AQE-skew-splittable — never from a cross
  *    join.
  */
object Dedup {

  /** Exact duplicate groups by content fingerprint: one row per
    * distinct fingerprint with the keeper (min id) and multiplicity.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), TextStats.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup: keep one row per fingerprint (the min-id row),
    * implemented as the standard window-rank dedup so the choice of
    * survivor is deterministic (dropDuplicates keeps an arbitrary row).
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Word-shingles of size n as an array column (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    // sliding n-grams via transform over index range; sequences shorter
    // than n fall back to the whole text as one shingle
    val ngrams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(ngrams)
  }

  /** One MinHash value: min over the token set of md5(seed || ":" || token).
    * md5 is deliberate — engine-portable (identical in any SQL engine,
    * so signatures are verifiable cross-system), deterministic, and
    * uniform. The min is taken lexicographically over the hex digest.
    *
    * Array-expression form; prefer `minhashSignatures` in pipelines —
    * Spark evaluates higher-order-function lambdas interpreted (no
    * codegen), measured ~6000× slower than the exploded form per hash.
    */
  def minhash(tokensCol: Column, seed: Int): Column =
    array_min(transform(tokensCol, t => md5(concat(lit(s"$seed:"), t))))

  /** k-hash MinHash signature frame: one row per doc with columns
    * mh0..mh(k-1).
    *
    * Shape: explode the distinct token set, compute the k seeded md5s
    * on flat rows (whole-stage codegen), and take k `min`s in one hash
    * aggregation. Map-side partial agg collapses to one row per doc
    * BEFORE the shuffle, so the shuffle volume is docs × k hashes — the
    * token explosion never crosses the network. This is the shape that
    * holds at corpus scale; the lambda-based alternative
    * (`transform`+`array_min`) is interpreted per element and was the
    * whole-suite bottleneck at sf0.1.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, tokensCol: Column, k: Int): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("__tok")))).as(s"mh$i"))
    docs
      .select(col(idCol), explode(array_distinct(tokensCol)).as("__tok"))
      .groupBy(idCol)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: docs × bands frame with band signature = md5 of the
    * concatenated minhashes in the band. rowsPerBand minhashes per band.
    */
  def lshBands(docs: DataFrame, idCol: String, tokensCol: Column,
      numHashes: Int, rowsPerBand: Int): DataFrame =
    lshBandsFromSignatures(
      minhashSignatures(docs, idCol, tokensCol, numHashes),
      idCol, numHashes, rowsPerBand)

  /** Banding over an ALREADY-COMPUTED signature frame (columns mh0..
    * mh{numHashes-1}) — lets a parameter sweep (q286) band the same
    * signatures several ways while the expensive minhash pass runs
    * once.
    */
  def lshBandsFromSignatures(sig: DataFrame, idCol: String,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val parts = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("sig"))
    }
    sig
      .select(col(idCol), explode(array(bands: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Candidate near-duplicate pairs: documents sharing any LSH band
    * signature. Output pairs id1 < id2, deduplicated across bands.
    *
    * Shape: ONE bucket aggregation (group by (band, sig), sorted id
    * list) followed by per-bucket pair expansion — not a self-join.
    * The naive `bands JOIN bands` formulation evaluates the whole
    * minhash pipeline twice (the two join inputs differ in their
    * projection, so no exchange reuse applies; measured 2× on the
    * sf0.1 plan) and shuffles it twice. Here the expensive lineage
    * runs once; pair output is quadratic per bucket under either
    * formulation (that IS the candidate semantics), and LSH buckets
    * are small by construction.
    *
    * `maxBucketSize` guards the pathological hot signature (boilerplate
    * text hashing thousands of docs into one bucket): buckets larger
    * than the cap are DROPPED — a signature that common is a stop-phrase,
    * not a near-dup signal, and its quadratic expansion would pile onto
    * one reducer row. 0 disables the cap.
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, tokensCol: Column,
      numHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucketSize: Int = 10000): DataFrame =
    lshCandidatePairsFromBands(
      lshBands(docs, idCol, tokensCol, numHashes, rowsPerBand),
      idCol, maxBucketSize)

  /** Candidate pairs from an already-banded frame — see
    * [[lshCandidatePairs]] for semantics and the bucket-cap guard.
    */
  def lshCandidatePairsFromBands(bands: DataFrame, idCol: String,
      maxBucketSize: Int): DataFrame = {
    val buckets = bands
      .groupBy("band", "sig")
      .agg(sort_array(collect_list(col(idCol))).as("__ids"))
      .filter(size(col("__ids")) >= 2)
    val capped =
      if (maxBucketSize > 0) buckets.filter(size(col("__ids")) <= maxBucketSize)
      else buckets
    capped
      .select(posexplode(col("__ids")).as(Seq("__i", "id1")), col("__ids"))
      .select(col("id1"),
        explode(slice(col("__ids"), col("__i") + 2, size(col("__ids")))).as("id2"))
      // duplicate input ids would land adjacent in the sorted bucket
      // and emit (x,x) — keep the guard the old self-join's id1 < id2
      // predicate provided
      .filter(col("id1") =!= col("id2"))
      .distinct()
  }

  /** Near-duplicate pairs by Hamming distance over an integer hash
    * column (the SimHash/pHash family): the hash is cut into `bands`
    * contiguous fields of `bits` bits each, ids sharing any band
    * value bucket-join ([[lshCandidatePairsFromBands]], inheriting
    * its hot-bucket cap), and candidates verify exactly with
    * bit_count(xor) <= maxHamming.
    *
    * Recall contract (pigeonhole): `maxHamming` flipped bits can
    * touch at most `maxHamming` bands, so every pair within the gate
    * shares an INTACT band — exact recall — iff maxHamming < bands;
    * the require makes that explicit instead of silently
    * probabilistic (a 2-band split claiming Hamming<=3 drops 2+1
    * flip splits: no intact half). Hot buckets above `maxBucketSize`
    * are dropped — the one deliberate recall exception, and it fires
    * on degenerate all-alike signatures (blank/solid templates), not
    * near-dup signal. bands*bits <= 63 keeps every band value and
    * the hash itself positive: DuckDB oracles error on a 64th-bit
    * shift, and signed-shift mirroring is a bug farm both engines
    * can simply avoid.
    *
    * Scale: one narrow (id, hash, band, sig) explode (bands
    * rows/doc), one bucket aggregation, per-bucket pair expansion
    * capped at maxBucketSize²/2 — the hash RIDES THROUGH the bucket
    * (8 bytes/row) so candidates verify inline in codegen instead of
    * re-joining the hash table twice (two shuffles of the full
    * candidate volume: measured 14.3 s → that join was most of it at
    * the 64× replica, where 15-bit bands' random-collision floor
    * makes ~9M candidates), and the cross-band dedup runs AFTER the
    * Hamming gate, on survivors only. No all-pairs stage at any
    * corpus size. Random-collision floor to plan around: with b-bit
    * bands, expected bucket occupancy is n/2^b per band — past
    * n ≈ maxBucketSize·2^b docs (~2M at 15/64) hot-bucket drops stop
    * being rare; band a WIDER perceptual hash (the op takes any
    * bits×bands ≤ 63) before that point. Output (id1, id2, hamming),
    * id1 < id2, one row per pair.
    */
  def hammingNearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
      bits: Int, bands: Int, maxHamming: Int,
      maxBucketSize: Int): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole-exact recall needs maxHamming < bands: $maxHamming >= $bands")
    val bandCols = hammingBandStructs(hashCol, bits, bands)
    val banded = hashes
      .select(col(idCol), col(hashCol).as("__h"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("__h"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
    // (id, hash) members sorted by id — struct ordering is
    // field-order, ids first, so pair expansion emits id1 < id2
    // exactly like lshCandidatePairsFromBands
    val buckets = banded
      .groupBy("band", "sig")
      .agg(sort_array(collect_list(
        struct(col(idCol).as("id"), col("__h").as("h")))).as("__m"))
      .filter(size(col("__m")) >= 2)
    val capped =
      if (maxBucketSize > 0) buckets.filter(size(col("__m")) <= maxBucketSize)
      else buckets
    capped
      .select(posexplode(col("__m")).as(Seq("__i", "__a")), col("__m"))
      .select(col("__a.id").as("id1"), col("__a.h").as("__h1"),
        explode(slice(col("__m"), col("__i") + 2, size(col("__m")))).as("__b"))
      .select(col("id1"), col("__h1"),
        col("__b.id").as("id2"), col("__b.h").as("__h2"))
      // duplicate input ids would land adjacent in the sorted bucket
      // and emit (x,x) — same guard as the LSH pair expansion
      .filter(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"),
        expr("CAST(bit_count(__h1 ^ __h2) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The (band, sig) cut of an integer hash: `bands` contiguous
    * fields of `bits` bits each, every value positive (<= 63 total
    * bits) so both engines mirror it shift-for-shift. ONE definition
    * of the geometry, shared by the batch pair op and the
    * incremental banding. */
  private def hammingBandStructs(hashCol: String, bits: Int,
      bands: Int): Seq[Column] = {
    require(bits > 0 && bands > 0 && bands * bits <= 63,
      s"bands*bits must stay under the sign bit: $bands x $bits")
    val mask = (1L << bits) - 1
    (0 until bands).map { b =>
      struct(lit(b.toLong).as("band"),
        expr(s"shiftright($hashCol, ${b * bits}) & $mask").as("sig"))
    }
  }

  /** Banded view of an integer-hash frame — the (id, band, sig) rows
    * [[hammingNearDupPairs]] buckets on, exposed so a pipeline can
    * PERSIST the banding as incremental state: feed the output to
    * [[lshIndex]] (the index shape is sig-type-agnostic) and probe
    * future batches with [[hammingDupIncremental]]. Same geometry
    * contract as the pair op: bands*bits <= 63, sig = the bits-wide
    * field b of the hash. Narrow (id, band, sig) — `bands` rows per
    * input row, no payload bytes. */
  def hammingBands(hashes: DataFrame, idCol: String, hashCol: String,
      bits: Int, bands: Int): DataFrame =
    hashes
      .select(col(idCol),
        explode(array(hammingBandStructs(hashCol, bits, bands): _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))

  /** INCREMENTAL Hamming near-dup — the multimodal (perceptual-hash)
    * member of the incremental family, [[lshDupIncremental]]'s exact
    * analog. State between ingest batches: the per-media hash table
    * (idCol, hashCol — 8 bytes a row) plus the [[lshIndex]]-shaped
    * (band, sig) -> ids index built from [[hammingBands]]. The
    * arriving batch bands its own hashes, probes the index with ONE
    * (band, sig) hash join — O(bands) lookups per arriving row
    * whatever the seen-corpus size — and every candidate verifies
    * exactly against the STORED hash (`bit_count(xor) <= maxHamming`);
    * seen payload bytes are never re-read, let alone re-hashed.
    * Pigeonhole recall contract as [[hammingNearDupPairs]]
    * (maxHamming < bands required — every qualifying pair shares an
    * intact band, so the index probe cannot miss one); the only
    * recall exception is the index's own write-time hot-signature
    * cap. Output (new_id, seen_id, hamming). Replayed ids match
    * nothing (self-pairs filtered), so a re-ingested batch after a
    * failed commit is safe; batch-INTERNAL pairs are a separate
    * composition — run [[hammingNearDupPairs]] over the batch alone.
    */
  def hammingDupIncremental(newHashes: DataFrame, stateHashes: DataFrame,
      stateIndex: DataFrame, idCol: String, hashCol: String,
      bits: Int, bands: Int, maxHamming: Int): DataFrame =
    hammingDupIncrementalFromBands(
      hammingBands(newHashes, idCol, hashCol, bits, bands),
      newHashes, stateHashes, stateIndex, idCol, hashCol, bands, maxHamming)

  /** [[hammingDupIncremental]] over the arriving batch's precomputed
    * [[hammingBands]] frame — callers that ALSO append those bands to
    * the stored index (the streaming ingest) band once and reuse the
    * frame on every path, exactly like
    * [[lshDupIncrementalFromBands]] on the text side. `bands` rides
    * along only to assert the pigeonhole contract. */
  def hammingDupIncrementalFromBands(newBands: DataFrame,
      newHashes: DataFrame, stateHashes: DataFrame,
      stateIndex: DataFrame, idCol: String, hashCol: String,
      bands: Int, maxHamming: Int): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole-exact recall needs maxHamming < bands: $maxHamming >= $bands")
    val cand = newBands
      .select(col(idCol).as("new_id"), col("band"), col("sig"))
      .join(stateIndex, Seq("band", "sig"))
      .select(col("new_id"), explode(col("ids")).as("seen_id"))
      .filter(col("new_id") =!= col("seen_id"))
      .distinct()
    cand
      .join(newHashes.select(col(idCol).as("new_id"), col(hashCol).as("__hn")),
        "new_id")
      .join(stateHashes.select(col(idCol).as("seen_id"), col(hashCol).as("__hs")),
        "seen_id")
      .select(col("new_id"), col("seen_id"),
        expr("CAST(bit_count(__hn ^ __hs) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowing fingerprint SELECTION (Schleimer, Wilkerson, Aiken —
    * MOSS, SIGMOD 2003) over a per-doc gram-hash sequence: slide a
    * `w`-gram window over each doc's hashes and select the window
    * MINIMUM, ties to the RIGHTMOST position (the paper's rule,
    * which makes consecutive windows reuse a selection and bounds
    * expected density at 2/(w+1)). Guarantee: two docs sharing a
    * gram run of >= w consecutive grams share a selected
    * fingerprint.
    *
    * Input `grams`: (idCol, ng, p, h) — p the 1-based gram position,
    * ng the doc's gram count, h the gram hash (hex string; "~"
    * sorts above every hex digit and stands in for "no neighbor").
    * Selection runs as ONE doc-ordered window pass (no w-times
    * explode, no window self-join — the q305/q310 shape): position
    * p is selected iff for SOME offset k in 0..w-1 with a valid
    * window [p-k, p-k+w-1], h <= its k left neighbors and
    * h < (strictly — rightmost among ties) its w-1-k right
    * neighbors. `rightmostTies = false` switches to the
    * tie-INCLUSIVE variant (every position holding a window's min
    * is selected — q310's form): the selected POSITION set grows on
    * ties, but the selected distinct-HASH set per doc is identical
    * under both rules (each window contributes exactly its min
    * value), so fingerprint-set consumers may use either. Returns
    * the selected rows unchanged.
    */
  def winnowSelect(grams: DataFrame, idCol: String, w: Int = 4,
      rightmostTies: Boolean = true): DataFrame = {
    require(w >= 2, s"winnowing needs a window of >= 2 grams, got $w")
    val wd = Window.partitionBy(idCol).orderBy("p")
    def lg(j: Int) = coalesce(lag(col("h"), j).over(wd), lit("~"))
    def ld(j: Int) = coalesce(lead(col("h"), j).over(wd), lit("~"))
    def lmin(k: Int) = (1 to k).map(lg).reduce(least(_, _))
    def rmin(k: Int) = (1 to k).map(ld).reduce(least(_, _))
    def valid(k: Int) =
      (col("p") - k >= 1) && (col("p") - k <= col("ng") - (w - 1))
    val selected = (0 until w).map { k =>
      val leftOk = if (k == 0) lit(true) else col("h") <= lmin(k)
      val rightOk =
        if (k == w - 1) lit(true)
        else if (rightmostTies) col("h") < rmin(w - 1 - k)
        else col("h") <= rmin(w - 1 - k)
      valid(k) && leftOk && rightOk
    }.reduce(_ || _)
    grams.withColumn("__sel", selected).filter(col("__sel")).drop("__sel")
  }

  /** Text → selected winnowing fingerprints, index-shaped: tokenize
    * on single spaces, hash every `gramTokens`-token gram (md5 hex —
    * deterministic across engines), select with [[winnowSelect]]'s
    * one-window pass, and emit the per-doc DISTINCT fingerprint set
    * as (idCol, band = 0, sig = hash) rows — `band` a constant
    * because winnowing has ONE fingerprint space, which is exactly
    * what lets [[lshIndex]] / [[lshIndexShard]] /
    * [[lshIndexMergeProbe]] / [[fingerprintDupIncremental]] serve it
    * verbatim. Docs with fewer than `w + gramTokens - 1` tokens
    * produce no grams window and silently emit nothing — too short
    * to carry a >= w-gram shared run, the MOSS guarantee's unit.
    * This is q318's fingerprinting stage factored out for the
    * streaming ingest; the q305/q310 production parameters are the
    * defaults.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 4, gramTokens: Int = 3): DataFrame = {
    val tokd = docs.select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("ng",
        (size(col("toks")) - (gramTokens - 1)).cast(org.apache.spark.sql.types.LongType))
      .filter(col("ng") >= w)
    val grams = tokd.select(col(idCol), col("ng"), posexplode(
        expr("transform(sequence(1, CAST(ng AS INT)), " +
          s"i -> md5(concat_ws(' ', slice(toks, i, $gramTokens))))")))
      .select(col(idCol), col("ng"),
        (col("pos") + 1).cast(org.apache.spark.sql.types.LongType).as("p"),
        col("col").as("h"))
    winnowSelect(grams, idCol, w)
      .select(col(idCol), lit(0).as("band"), col("h").as("sig"))
      .distinct()
  }

  /** INCREMENTAL fingerprint-overlap near-dup — the MOSS member of
    * the incremental family ([[lshDupIncremental]] /
    * [[hammingDupIncremental]]'s analog for winnowing fingerprints).
    * State between ingest batches: the seen docs' selected
    * fingerprint table plus the [[lshIndex]]-shaped fingerprint →
    * ids index (band a constant 0 — winnowing has one fingerprint
    * space — so the sharded/merge-probe machinery is shared
    * verbatim: [[lshIndexShard]] / [[lshIndexMergeProbe]] work
    * unchanged). The arriving batch fingerprints ONLY ITSELF
    * (O(batch) gram/window work), probes the index with one hash
    * join — per-probe cost O(fingerprints per doc) whatever the
    * seen-corpus size — and each candidate pair scores by its
    * DISTINCT shared-fingerprint count, MOSS's match strength.
    * Fingerprint equality IS the verification (a shared fingerprint
    * is a shared gram run by construction), so unlike the
    * MinHash/pHash members there is no second verify join and the
    * seen TEXT is never re-read. The index's write-time hot cap is
    * the only recall exception (a boilerplate run shared by more
    * than `maxIdsPerSig` docs stops generating candidates — the
    * MOSS "too common to be interesting" filter). Replayed ids
    * match nothing (self-pairs filtered), so a re-ingested batch
    * after a failed commit is safe; batch-internal pairs are a
    * separate composition — probe the batch against its own index.
    * Output (new_id, seen_id, n_shared), n_shared >= minShared.
    */
  def fingerprintDupIncremental(newBands: DataFrame, stateIndex: DataFrame,
      idCol: String, minShared: Int): DataFrame =
    newBands
      .select(col(idCol).as("new_id"), col("band"), col("sig"))
      .join(stateIndex, Seq("band", "sig"))
      .select(col("new_id"), col("band"), col("sig"),
        explode(col("ids")).as("seen_id"))
      .filter(col("new_id") =!= col("seen_id"))
      .distinct()
      .groupBy("new_id", "seen_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Exact n-gram Jaccard similarity between two token-array columns. */
  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * near-dup removal in embedding space. Vectors are routed to their
    * nearest centroid (broadcast argmin, ties to the smallest cell
    * id), pairs are compared ONLY within a cell, and the higher-id
    * member of every pair with cosine >= `tau` is dropped.
    *
    * `vecs` needs (idCol, vecCol: array<double>); `centroids` needs
    * (cell, cv: array<double>) and is broadcast — ALWAYS size it
    * ~sqrt(corpus): with k cells the within-cell pair count is
    * ~n²/k, so a FIXED k is quadratic in the corpus while k ~ sqrt(n)
    * keeps total pairs ~n^1.5 and per-cell work bounded (measured:
    * the 8-cell q273 instantiation is 31 s at 64× sf0.1 — fine for
    * the hash-gate corpus, wrong shape for growth; feed more
    * centroids, e.g. a [[graft.queries]] q142-style k-means set, to
    * scale out). Returns one row per (cell, id, drop_id) pair above
    * the threshold — callers aggregate or anti-join as needed.
    *
    * This is the AUDIT regime: prefer [[semanticDup]], which routes
    * here only while the corpus count stays under
    * [[ExactRegimeMaxRows]] and flips to the linear
    * [[semanticDupPairsPruned]] beyond it.
    */
  def semanticDupPairs(vecs: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame =
    semanticDupPairsFromAssignment(vecs,
      assignCells(vecs, centroids, idCol, vecCol), idCol, vecCol, tau)

  /** Nearest-centroid assignment (the coarse-quantizer half of
    * [[semanticDupPairs]]), exposed so callers that also need the
    * assignment (cell censuses, per-cell summaries) compute it ONCE —
    * at k ~ sqrt(n) centroids the n×k distance evaluation is half the
    * operator's cost, so recomputing it doubles the bill. */
  def assignCells(vecs: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    assignCellsWithDist(vecs, centroids, idCol, vecCol)
      .select(col(idCol), col("cell"))

  /** Nearest-centroid assignment WITH the squared distance kept —
    * the variant [[semanticDupPairsPruned]] needs (the per-cell
    * representative is the member closest to its centroid). THE one
    * definition of the assignment semantics: [[assignCells]]
    * delegates here, so the distance expression and the
    * ties-to-smallest-cell rule live in a single place. Output
    * (idCol, cell, d2).
    */
  def assignCellsWithDist(vecs: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val sq = s"aggregate(zip_with($vecCol, cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"
    vecs.crossJoin(broadcast(centroids))
      .withColumn("__d2", expr(sq))
      .groupBy(idCol)
      .agg(min(struct(col("__d2"), col("cell"))).as("__best"))
      .select(col(idCol), col("__best.cell").as("cell"),
        col("__best.__d2").as("d2"))
  }

  /** SemDeDup's PRODUCTION pruning regime: instead of the exact
    * within-cell all-pairs scan (~n²/k — the n^1.5 tail of
    * [[semanticDupPairs]] at k ~ sqrt(n)), each cell elects ONE
    * representative — the member nearest its centroid, ties to the
    * smallest id — and every other member is compared against the
    * representative only. One cosine per row: the pair stage is
    * LINEAR in the corpus regardless of k, which frees the quantizer
    * size to be a quality knob instead of a pair-count bound (the
    * paper prunes per-cluster comparisons the same way once clusters
    * outgrow exact pairing). Recall tradeoff: a duplicate pair whose
    * members are BOTH far from the representative is missed — the
    * price of linearity; tighten with more cells, not more pairs.
    *
    * Inputs as [[semanticDupPairs]]; returns (cell, rep, drop_id,
    * cos) — one row per member whose cosine to its cell's
    * representative is ≥ `tau`.
    */
  def semanticDupPairsPruned(vecs: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame =
    semanticDupPairsPrunedFromAssignment(vecs,
      assignCellsWithDist(vecs, centroids, idCol, vecCol),
      idCol, vecCol, tau)

  /** The pruned pair half over a precomputed [[assignCellsWithDist]]
    * frame `(idCol, cell, d2)` — exposed like
    * [[semanticDupPairsFromAssignment]] so callers that also need the
    * assignment (cell censuses) compute it once. */
  def semanticDupPairsPrunedFromAssignment(vecs: DataFrame, asg: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame = {
    // k rows (one per non-empty cell) — broadcast-sized by design
    val reps = asg
      .groupBy("cell").agg(min(struct(col("d2"), col(idCol))).as("__r"))
      .select(col("cell"), col(s"__r.$idCol").as("rep"))
    val repVecs = broadcast(reps
      .join(vecs.select(col(idCol).as("rep"), col(vecCol).as("__rv")), "rep"))
    asg.join(vecs, idCol).join(repVecs, "cell")
      .filter(col(idCol) =!= col("rep"))
      .withColumn("cos",
        graft.functions.VectorExprs.cosineSim(col(vecCol), col("__rv")))
      .filter(col("cos") >= tau)
      .select(col("cell"), col("rep"), col(idCol).as("drop_id"), col("cos"))
  }

  /** Per-cell census of the PRUNED regime in ONE pass over the
    * assignment: `n_docs` (cell membership) and `n_dropped` (members
    * whose cosine to the cell representative clears `tau`) are both
    * conditional aggregates over the same
    * (assignment ⋈ vecs ⋈ broadcast reps) rows
    * [[semanticDupPairsPrunedFromAssignment]] filters — the drop
    * predicate is evaluated as a per-row flag instead of a filter,
    * so the census never re-reads the assignment separately (the
    * two-groupBy + left-join shape paid an extra assignment scan,
    * an exchange and a join for values computable in one aggregate).
    * Each member is compared against exactly ONE representative, so
    * the flagged count equals the pruned form's drop-row count.
    * Returns (cell, n_docs, n_dropped). */
  def semanticDupPrunedCensusFromAssignment(vecs: DataFrame,
      asg: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame = {
    val reps = asg
      .groupBy("cell").agg(min(struct(col("d2"), col(idCol))).as("__r"))
      .select(col("cell"), col(s"__r.$idCol").as("rep"))
    val repVecs = broadcast(reps
      .join(vecs.select(col(idCol).as("rep"), col(vecCol).as("__rv")), "rep"))
    val dropped = col(idCol) =!= col("rep") &&
      graft.functions.VectorExprs.cosineSim(col(vecCol), col("__rv")) >= tau
    asg.join(vecs, idCol).join(repVecs, "cell")
      .groupBy("cell")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(dropped, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Total-cosine budget for the EXACT SemDeDup regime: the number
    * of pairwise comparisons the router may spend on the all-pairs
    * audit before it must flip to the linear pruned form. 2^31
    * (~2.1e9) cosines is minutes of vector math on one executor
    * core and embarrassingly parallel across cells — the most the
    * audit's extra recall is worth before pruning wins.
    */
  val ExactPairBudget: Long = 1L << 31

  /** Default corpus-count ceiling for the EXACT SemDeDup regime,
    * DERIVED from [[ExactPairBudget]] rather than pinned. At
    * k ~ sqrt(n) cells the per-cell pair count is (n/k)²/2 but the
    * TOTAL across k cells is k·(n/k)²/2 = n²/(2k) = n^1.5/2 — it is
    * the total the cluster pays, so the total is what the budget
    * bounds: n^1.5/2 ≤ B  ⇔  n ≤ (2B)^(2/3). At B = 2^31 the
    * ceiling is (2^32)^(2/3) = 2^(64/3) ≈ 2.6M rows (total ~2.1e9
    * cosines); a fixed 2^24 ceiling would have let a default-config
    * caller ride ~3.4e10 cosines (n^1.5/2 at 2^24) — 16× the
    * budget — before flipping. The same count-derived-sizing
    * discipline as [[Similarity.derivedBits]]: ONE definition,
    * referenced by the router and pinned by DedupSpec.
    *
    * BEHAVIOR CHANGE (round 13): this ceiling used to be a pinned
    * 2^24 (~16.8M rows). Deriving it from the pair budget moved it
    * down to ~2.6M, so default-config [[semanticDup]] callers with
    * corpora between ~2.6M and ~16.8M rows now route to the PRUNED
    * regime (linear cost, lower recall: only per-cell-representative
    * cosines are audited) where they previously got the exact
    * all-pairs audit. Callers who want the old routing at their own
    * compute cost pass `exactMaxRows = 1L << 24` explicitly. No
    * oracle SQL encodes the boundary — q311/q312 gate each regime by
    * forcing it via the `exactMaxRows` parameter, not by corpus size.
    */
  val ExactRegimeMaxRows: Long =
    math.floor(math.pow(2.0 * ExactPairBudget.toDouble, 2.0 / 3.0)).toLong

  /** Count-derived regime routing for SemDeDup — the entry point a
    * pipeline should call. Picks the EXACT within-cell all-pairs
    * form ([[semanticDupPairs]], the paper's audit regime, ~n²/k
    * pairs) while the corpus fits under `exactMaxRows`, and the
    * LINEAR per-cell-representative form
    * ([[semanticDupPairsPruned]]) once it outgrows it — so a growing
    * corpus can never silently ride the n^1.5 tail. Both regimes
    * normalize to the same drop frame (cell, drop_id), distinct —
    * the set of members SemDeDup removes — so downstream anti-joins
    * are regime-agnostic. `corpusCount` is passed in (callers have
    * already counted to size the quantizer — recounting here would
    * add a scan).
    */
  def semanticDup(vecs: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, tau: Double, corpusCount: Long,
      exactMaxRows: Long = ExactRegimeMaxRows): DataFrame =
    semanticDupFromAssignment(vecs,
      assignCellsWithDist(vecs, centroids, idCol, vecCol),
      idCol, vecCol, tau, corpusCount, exactMaxRows)

  /** [[semanticDup]] over a precomputed [[assignCellsWithDist]]
    * frame `(idCol, cell, d2)` — callers that also census the cells
    * compute the n×k assignment once. */
  def semanticDupFromAssignment(vecs: DataFrame, asg: DataFrame,
      idCol: String, vecCol: String, tau: Double, corpusCount: Long,
      exactMaxRows: Long = ExactRegimeMaxRows): DataFrame =
    if (corpusCount <= exactMaxRows)
      semanticDupPairsFromAssignment(vecs,
          asg.select(col(idCol), col("cell")), idCol, vecCol, tau)
        .select(col("cell"), col("j2").as("drop_id")).distinct()
    else
      semanticDupPairsPrunedFromAssignment(vecs, asg, idCol, vecCol, tau)
        .select(col("cell"), col("drop_id")).distinct()

  /** Per-cell representatives of a clustered corpus — the STATE an
    * incremental SemDeDup pipeline persists between ingest batches
    * (a TxLog table is the natural home: k rows, one per non-empty
    * cell). `rep` is the member nearest its centroid, ties to the
    * smallest id — the SAME election [[semanticDupPairsPruned]]
    * makes internally, so a batch deduped incrementally against this
    * state sees the contract the pruned regime would have applied.
    * Output (cell, rep, rep_vec).
    */
  def cellRepresentatives(vecs: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val asg = assignCellsWithDist(vecs, centroids, idCol, vecCol)
    asg.groupBy("cell").agg(min(struct(col("d2"), col(idCol))).as("__r"))
      .select(col("cell"), col(s"__r.$idCol").as("rep"))
      .join(vecs.select(col(idCol).as("rep"), col(vecCol).as("rep_vec")), "rep")
      .select("cell", "rep", "rep_vec")
  }

  /** INCREMENTAL SemDeDup — the operator a continuously-ingesting
    * pipeline actually runs: dedup an ARRIVING batch against the
    * state of everything already seen (the existing centroids plus
    * the stored [[cellRepresentatives]]), never re-reading — let
    * alone re-clustering — the seen corpus itself. Each new vector
    * is assigned to its nearest existing centroid (broadcast argmin)
    * and compared against that cell's stored representative only:
    * cost is O(|batch| × k) assignment + O(|batch|) cosines,
    * INDEPENDENT of how many rows the state summarizes — batch 10^6
    * against a 10^11-row seen corpus costs the same as against 10^4.
    * Recall matches the pruned regime's contract (a new dup far from
    * its cell's representative is missed; tighten with more cells);
    * batch-INTERNAL dups are a separate composition — run
    * [[semanticDup]] over the batch alone. Returns (cell, rep,
    * drop_id, cos) — the new-batch members the stored state drops.
    */
  def semanticDupIncremental(newVecs: DataFrame, reps: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame =
    semanticDupIncrementalFromAssignment(newVecs,
      assignCells(newVecs, centroids, idCol, vecCol),
      reps, idCol, vecCol, tau)

  /** [[semanticDupIncremental]] over a precomputed [[assignCells]]
    * frame `(idCol, cell)` — callers that also census the batch's
    * cell occupancy compute the |batch| × k assignment once. */
  def semanticDupIncrementalFromAssignment(newVecs: DataFrame,
      asg: DataFrame, reps: DataFrame, idCol: String, vecCol: String,
      tau: Double): DataFrame =
    asg.join(newVecs, idCol)
      .join(broadcast(reps), Seq("cell"))
      // a caller replaying ids already in the state must not
      // self-drop the representative itself
      .filter(col(idCol) =!= col("rep"))
      .withColumn("cos",
        graft.functions.VectorExprs.cosineSim(col(vecCol), col("rep_vec")))
      .filter(col("cos") >= tau)
      .select(col("cell"), col("rep"), col(idCol).as("drop_id"), col("cos"))

  /** The pair half of [[semanticDupPairs]] over a precomputed
    * assignment frame `(idCol, cell)`. */
  def semanticDupPairsFromAssignment(vecs: DataFrame, asg: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame = {
    val members = asg.join(vecs, idCol)
    members.select(col("cell"), col(idCol).as("i"), col(vecCol).as("__vi"))
      .join(members.select(col("cell"), col(idCol).as("j2"), col(vecCol).as("__vj")),
        Seq("cell"))
      .filter(col("i") < col("j2"))
      .withColumn("cos", graft.functions.VectorExprs.cosineSim(col("__vi"), col("__vj")))
      .filter(col("cos") >= tau)
      .select(col("cell"), col("i"), col("j2"))
  }

  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val uni = size(array_union(a, b)).cast(DoubleType)
    round(inter / greatest(uni, lit(1.0)), 4)
  }

  /** The persistable LSH INDEX of a seen corpus — the state an
    * incremental MinHash-LSH pipeline stores between ingest batches
    * (alongside the per-doc signature table): one row per (band,
    * signature) bucket holding the sorted member ids. Hot signatures
    * (more than `maxIdsPerSig` members) are dropped AT WRITE TIME —
    * a signature that common is a stop-phrase, not a near-dup
    * signal, and capping here is what keeps every future probe's
    * per-hit fan-out bounded (same rationale as
    * [[lshCandidatePairs]]' `maxBucketSize`). Compact: the index
    * never stores text, only ids — ~bands rows per seen doc
    * amortized, collapsed to one row per occupied bucket.
    */
  def lshIndex(bands: DataFrame, idCol: String,
      maxIdsPerSig: Int = 10000): DataFrame = {
    val buckets = bands
      .groupBy("band", "sig")
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
    if (maxIdsPerSig > 0) buckets.filter(size(col("ids")) <= maxIdsPerSig)
    else buckets
  }

  /** [[lshIndex]] variant for APPEND-ONLY SHARDS. A single-index cap
    * drops a hot bucket ENTIRELY; a sharded store must make the same
    * decision at MERGE time ([[lshIndexMergeProbe]] filters on the
    * merged size). If the shard writer FILTERED over-cap buckets the
    * way [[lshIndex]] does, a bucket that went hot within one commit
    * would vanish from that shard — and a few late ids appended by
    * later commits would merge to an under-cap view whose probes
    * match only the late members while the early hot ones stay
    * permanently invisible: semantics no single capped index has. So
    * the shard form KEEPS over-cap buckets, truncated to cap+1 ids —
    * a tombstone just big enough that any merged view containing the
    * row exceeds the cap and drops the bucket, exactly as a single
    * write-time-capped index over the union would. Kept (under-cap)
    * buckets are never truncated: a merged size <= cap implies every
    * contributing shard row had <= cap ids. Shard rows stay bounded
    * at cap+1 whatever the hot bucket's true size.
    *
    * Each shard row also records `n` — the TRUE pre-truncation bucket
    * size. The cap+1 tombstone alone reproduces single-index
    * semantics only when the merge-probe runs with the SAME cap as
    * the writer; a larger probe-time cap would otherwise KEEP a
    * truncated row (cap+1 <= probeCap) and silently probe an
    * incomplete bucket. With `n` stored, [[lshIndexMergeProbe]]
    * filters on the true merged size and drops any bucket whose
    * stored ids are incomplete — the write cap is thus an explicit
    * recall floor (ids above it are unrecoverable by construction),
    * never a silent one.
    */
  def lshIndexShard(bands: DataFrame, idCol: String,
      maxIdsPerSig: Int): DataFrame = {
    val buckets = lshIndex(bands, idCol, maxIdsPerSig = 0)
      .withColumn("n", size(col("ids")).cast("long"))
    if (maxIdsPerSig > 0)
      buckets.withColumn("ids", slice(col("ids"), 1, maxIdsPerSig + 1))
    else buckets
  }

  /** Merge + hot-cap the PROBED slice of an APPEND-ONLY sharded LSH
    * index. A continuously-ingesting pipeline cannot rewrite stored
    * buckets (ACID appends only), so it appends one [[lshIndex]]-
    * shaped SHARD per commit and a (band, sig) bucket may span
    * several rows — one per commit that touched it. This
    * reconstructs the capped single-row view for exactly the buckets
    * one arriving batch probes: the batch's (band, sig) keys
    * broadcast (batch-sized), the shard scan matches against them
    * without shuffling the state, and the merge groupBy runs over
    * the MATCHED rows only — never a collect_list over the whole
    * seen index (the full rebuild is what made the first streaming
    * ingest linear in the seen corpus per batch). The membership cap
    * applies to the MERGED size, so a signature that turned hot
    * across commits drops exactly as a single write-time cap would
    * have dropped it — PROVIDED shards are written with
    * [[lshIndexShard]], whose cap+1 truncation tombstone keeps
    * within-commit-hot buckets visible to this merged-size filter (a
    * filtered shard write would resurrect such a bucket once later
    * commits appended a few under-cap ids, probing only the late
    * members while the early hot ones stay permanently invisible).
    * Output is [[lshIndex]]-shaped: (band, sig,
    * ids sorted), cap-filtered — feed it to
    * [[lshDupIncrementalFromBands]] / [[hammingDupIncremental]].
    *
    * The one remaining seen-size cost is the shard SCAN itself
    * (narrow rows, no shuffle); at lakehouse scale, partition the
    * shard table by `band` and cluster by `sig` so the scan prunes.
    */
  def lshIndexMergeProbe(shards: DataFrame, probeBands: DataFrame,
      maxIdsPerSig: Int): DataFrame = {
    // STATE-FORMAT NOTE: shard rows carry `n`, the TRUE pre-truncation
    // bucket size, since [[lshIndexShard]] started recording it (r16).
    // Index tables persisted by the earlier shard format (no `n`
    // column) are backfilled here as n = size(ids) — the stored size,
    // which for those tables IS the only size ever known — so a
    // pre-existing TxLog index keeps its original cap semantics
    // instead of hard-failing analysis on the missing column.
    val withN =
      if (shards.columns.contains("n")) shards
      else shards.withColumn("n", size(col("ids")).cast("long"))
    val merged = withN
      .join(broadcast(probeBands.select("band", "sig").distinct()),
        Seq("band", "sig"))
      .groupBy("band", "sig")
      .agg(array_sort(flatten(collect_list(col("ids")))).as("ids"),
        sum(col("n")).as("__n"))
    // cap filter on the TRUE merged size (the pre-truncation `n`
    // shards record), plus a completeness check: a bucket containing
    // any write-time-truncated row (stored ids < n) is dropped even
    // when a LARGER probe cap would admit its true size — the missing
    // ids are unrecoverable, and probing the partial bucket would
    // silently reduce recall. Shard-write cap = explicit recall floor.
    val complete = merged.filter(size(col("ids")) === col("__n"))
    (if (maxIdsPerSig > 0) complete.filter(col("__n") <= maxIdsPerSig)
     else complete).drop("__n")
  }

  /** INCREMENTAL MinHash-LSH near-dup — dedup an ARRIVING batch
    * against the stored index of everything already seen, never
    * re-shingling (let alone re-reading) the seen corpus. The
    * arriving batch's signatures band and probe the stored
    * [[lshIndex]] with one hash join on (band, sig) — per-probe cost
    * is O(bands) lookups whatever the seen-corpus size — and every
    * candidate (new, seen) pair then VERIFIES against the stored
    * per-doc SIGNATURE table, not the seen text: `n_match` counts
    * agreeing minhashes, an unbiased Jaccard estimator
    * (E[n_match/k] = J, Broder's theorem) that costs k column
    * comparisons per candidate and keeps the state text-free. A band
    * collision already implies `rowsPerBand` agreeing minhashes, so
    * `minMatches` below that is a no-op and above it is the
    * precision knob. Output (new_id, seen_id, n_match), one row per
    * surviving pair. Batch-internal dups are a separate composition
    * — run [[lshCandidatePairs]] over the batch alone.
    */
  def lshDupIncremental(newSigs: DataFrame, stateSigs: DataFrame,
      stateIndex: DataFrame, idCol: String, numHashes: Int,
      rowsPerBand: Int, minMatches: Int): DataFrame =
    lshDupIncrementalFromBands(
      lshBandsFromSignatures(newSigs, idCol, numHashes, rowsPerBand),
      newSigs, stateSigs, stateIndex, idCol, numHashes, minMatches)

  /** [[lshDupIncremental]] over the arriving batch's precomputed
    * [[lshBandsFromSignatures]] frame — callers that ALSO append
    * those bands to the stored index (the streaming ingest) band
    * once and reuse the frame on both paths. */
  def lshDupIncrementalFromBands(newBands: DataFrame, newSigs: DataFrame,
      stateSigs: DataFrame, stateIndex: DataFrame, idCol: String,
      numHashes: Int, minMatches: Int): DataFrame = {
    val cand = newBands
      .select(col(idCol).as("new_id"), col("band"), col("sig"))
      .join(stateIndex, Seq("band", "sig"))
      .select(col("new_id"), explode(col("ids")).as("seen_id"))
      // replayed ids (a batch re-ingested after a failed commit) must
      // not match themselves
      .filter(col("new_id") =!= col("seen_id"))
      .distinct()
    val nMatch = (0 until numHashes)
      .map(i => when(col(s"__na.mh$i") === col(s"__sb.mh$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand
      .join(newSigs.as("__na"), cand("new_id") === col(s"__na.$idCol"))
      .join(stateSigs.as("__sb"), cand("seen_id") === col(s"__sb.$idCol"))
      .select(col("new_id"), col("seen_id"), nMatch.as("n_match"))
      .filter(col("n_match") >= minMatches)
  }
}
