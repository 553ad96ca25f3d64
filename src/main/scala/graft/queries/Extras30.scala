package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import QueryDef.table

/** Round-11 batch: SemDeDup's production pruning regime (q304) and
  * follow-on curation gates. Same determinism discipline as
  * Extras27-29: exact integer accumulators, one pinned double
  * expression tree per row where floats are unavoidable, every
  * query ends in a total ORDER BY, and every sizing constant derives
  * from the corpus count with a pure-SQL mirror in the oracle.
  */
object Extras30 {

  /** Left-associated explicit squared-distance sum over the 64-dim
    * embedding — term-for-term the same double additions Spark's
    * `aggregate(zip_with(...), 0D, acc + x)` folds, so the oracle's
    * argmin ties break identically (no sqrt compression, no libm). */
  private def d2Sql(a: String, b: String): String =
    (1 to 64).map(i => s"($a[$i]-$b[$i])*($a[$i]-$b[$i])").mkString(" + ")

  val all: Seq[QueryDef] = Seq(

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540) in the PRODUCTION
    // pruning regime — q273's exact within-cell pair scan is the
    // paper's audit form (~n²/k pairs, the one super-linear tail left
    // in round 10); at deployment scale the per-cluster comparison is
    // pruned to ONE representative per cell (the member nearest its
    // centroid) and every other member is compared against it only.
    // The pair stage becomes LINEAR in the corpus regardless of cell
    // count, which demotes k from a pair-count bound to a quality
    // knob: here k ~ n^(1/4) (two correctly-rounded IEEE sqrts — the
    // q273 portability argument squared), so the n×k assignment term
    // stays ~n^1.25 and the 64× wall ratio sits near the suite's
    // linear median instead of q273's measured 12×. Recall tradeoff
    // vs q273: a duplicate pair whose members are BOTH far from the
    // representative is missed — tighten with more cells (a trained
    // q142-style codebook in production), never with more pairs.
    QueryDef("q304_semantic_dedup_pruned",
      (s, d) => {
        val fv = table(s, d, "embeddings").select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        val k = math.max(8L, math.ceil(math.sqrt(
          math.ceil(math.sqrt(fv.count().toDouble)))).toLong)
        val cc = fv.filter(col("vec_id") < k)
          .select(col("vec_id").as("cell"), col("v").as("cv"))
        // ONE n×k assignment pass, pinned (caller-owned checkpoint,
        // q273's documented pattern) — census and pruned pair stage
        // both read it
        val asg = graft.ops.Dedup.assignCellsWithDist(fv, cc, "vec_id", "v")
          .transform(graft.ops.Pinned.pin)
        // ONE census aggregate (Dedup.semanticDupPrunedCensusFrom-
        // Assignment): the r17 shape read the pinned assignment twice
        // (drop-count groupBy + doc census) and stitched them with a
        // left join; both counts fold into one conditional aggregate
        // over the same pruned-compare rows. The asg pin stays — the
        // rep election and the census pass are two consumers.
        graft.ops.Dedup
          .semanticDupPrunedCensusFromAssignment(fv, asg, "vec_id", "v",
            tau = 0.35)
          .select(col("cell"), col("n_docs"), col("n_dropped"),
            (col("n_docs") - col("n_dropped")).as("n_kept"))
          .orderBy("cell")
      },
      Some(s"""WITH emb AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
              cc AS (SELECT vec_id AS cell, v AS cv FROM emb
                     WHERE vec_id < (SELECT GREATEST(8, CAST(CEIL(SQRT(
                         CEIL(SQRT(COUNT(*))))) AS BIGINT))
                       FROM embeddings)),
              -- window orders by the d2 ALIAS (computed once in the
              -- innermost select): inlining the 64-term expression
              -- into the window ORDER BY re-evaluates it per sort
              -- comparison — measured ~5k transient jemalloc mappings
              -- here (q311's wider variant: ~50k), enough to trip
              -- vm.max_map_count across a long oracle batch
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
              drops AS (
                SELECT a.cell, COUNT(*) AS n_dropped
                FROM asg a JOIN reps r ON a.cell = r.cell
                JOIN emb m ON m.vec_id = a.vec_id
                JOIN emb rv ON rv.vec_id = r.rep
                WHERE a.vec_id <> r.rep
                  AND list_cosine_similarity(m.v, rv.v) >= 0.35
                GROUP BY a.cell),
              docs AS (SELECT cell, COUNT(*) AS n_docs FROM asg GROUP BY 1)
              SELECT d.cell, d.n_docs,
                     COALESCE(dr.n_dropped, 0) AS n_dropped,
                     d.n_docs - COALESCE(dr.n_dropped, 0) AS n_kept
              FROM docs d LEFT JOIN drops dr ON dr.cell = d.cell
              ORDER BY d.cell""")),

    // Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    // MOSS, SIGMOD 2003): per doc, hash every k-gram (k=3 tokens),
    // slide a w=4 window over the hash sequence, and select the
    // window MINIMUM — ties to the RIGHTMOST position (the paper's
    // rule, which makes consecutive windows reuse the same selection
    // and bounds density at 2/(w+1) expected). Guarantee: any shared
    // token run of length >= w+k-1 = 6 between two docs shares a
    // selected fingerprint. All window math is the q263 offset-join
    // shape — a 4x equi-join expansion of the gram frame, zero range
    // joins, one gram shuffle — and every output column is an exact
    // integer, so the oracle mirrors line for line. Scale: grams ~
    // tokens, windows ~ tokens, both linear; no cross-doc stage at
    // all (the fingerprint INDEX this feeds is q263's hash-join job).
    QueryDef("q305_winnowing_fingerprints",
      (s, d) => {
        val tokd = table(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("ng", (size(col("toks")) - 2).cast(LongType))
          .filter(col("ng") >= 4) // need at least one FULL window of 4 grams
        val grams = tokd
          .select(col("doc_id"), col("ng"), posexplode(
            expr("transform(sequence(1, CAST(ng AS INT)), " +
              "i -> md5(concat_ws(' ', slice(toks, i, 3))))")))
          .select(col("doc_id"), col("ng"),
            (col("pos") + 1).cast(LongType).as("p"), col("col").as("h"))
        // selection as ONE doc-ordered window pass (the q310 trick —
        // no 4x explode, no wins self-join); factored to
        // ops/Dedup.winnowSelect in round 15 so the incremental
        // member (q318) selects with the SAME expressions.
        // Bit-identical to the explicit window/offset form the
        // oracle still states.
        val sel = graft.ops.Dedup.winnowSelect(grams, "doc_id", w = 4)
          .groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
        tokd.select(col("doc_id"), col("ng").as("n_grams"),
            (col("ng") - 3).as("n_windows"))
          .join(sel, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_fp"))
          .withColumn("density_pm", expr("(n_fp * 1000) div n_windows"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
              tokd AS (SELECT doc_id, toks,
                              CAST(len(toks) - 2 AS BIGINT) AS ng
                       FROM tok WHERE len(toks) - 2 >= 4),
              grams AS (
                SELECT doc_id, ng, CAST(t.i AS BIGINT) AS p,
                       md5(array_to_string(toks[t.i:t.i+2], ' ')) AS h
                FROM tokd, UNNEST(generate_series(1, CAST(ng AS INT))) AS t(i)),
              x AS (
                SELECT doc_id, p - t.off AS w, p, h
                FROM grams, UNNEST([0,1,2,3]) AS t(off)
                WHERE p - t.off >= 1 AND p - t.off <= ng - 3),
              wins AS (SELECT doc_id, w, MIN(h) AS wmin
                       FROM x GROUP BY doc_id, w),
              winner AS (
                SELECT x.doc_id, x.w, MAX(x.p) AS fp_pos
                FROM x JOIN wins ON x.doc_id = wins.doc_id AND x.w = wins.w
                WHERE x.h = wins.wmin
                GROUP BY x.doc_id, x.w),
              sel AS (SELECT doc_id, COUNT(*) AS n_fp FROM (
                        SELECT DISTINCT doc_id, fp_pos FROM winner)
                      GROUP BY doc_id)
              SELECT t.doc_id, t.ng AS n_grams, t.ng - 3 AS n_windows,
                     COALESCE(s.n_fp, 0) AS n_fp,
                     (COALESCE(s.n_fp, 0) * 1000) // (t.ng - 3) AS density_pm
              FROM tokd t LEFT JOIN sel s ON s.doc_id = t.doc_id
              ORDER BY t.doc_id""")),

    // Shard-novelty saturation curve: split the corpus into 16 shards
    // by ingestion order (doc_id stride — the count-derived formula
    // doc_id*16 div n keeps 16 shards at ANY corpus size) and count,
    // per shard, how many distinct token 3-grams appear for the FIRST
    // time. The curve's flattening rate is the standard "is more of
    // this source still worth crawling" signal — a template-heavy
    // source saturates in the first shards. Two gram-keyed shuffles
    // (first-shard min, per-shard distinct), both vocab-sized; the
    // cumulative sum runs over 16 rows.
    QueryDef("q306_shard_gram_novelty",
      (s, d) => {
        val docs = table(s, d, "documents")
        val n = docs.count()
        val tokd = docs
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("ng", (size(col("toks")) - 2).cast(LongType))
          .filter(col("ng") >= 1)
          // least(15, ...) guards the 1-based-dense-id edge: doc_id == n
          // would otherwise mint a 17th shard (16) — the clamp keeps the
          // "16 shards at ANY corpus size" contract for 0- AND 1-based ids
          .withColumn("shard", expr(s"least(15L, (doc_id * 16) div ${n}L)"))
        val grams = tokd
          .select(col("shard"), explode(
            expr("transform(sequence(1, CAST(ng AS INT)), " +
              "i -> md5(concat_ws(' ', slice(toks, i, 3))))")).as("h"))
          .distinct() // (shard, gram) presence
        val first = grams.groupBy("h").agg(min(col("shard")).as("fs"))
        val perShard = grams.groupBy("shard").agg(count(lit(1)).as("n_distinct"))
        val news = first.groupBy(col("fs").as("shard"))
          .agg(count(lit(1)).as("n_new"))
        val w = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perShard.join(news, Seq("shard"), "left")
          .na.fill(0L, Seq("n_new"))
          .withColumn("cum_new", sum(col("n_new")).over(w))
          .orderBy("shard")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
              tokd AS (SELECT doc_id, toks,
                              CAST(len(toks) - 2 AS BIGINT) AS ng,
                       LEAST(15, (doc_id * 16) //
                         (SELECT COUNT(*) FROM documents)) AS shard
                       FROM tok WHERE len(toks) - 2 >= 1),
              grams AS (
                SELECT DISTINCT shard,
                       md5(array_to_string(toks[t.i:t.i+2], ' ')) AS h
                FROM tokd, UNNEST(generate_series(1, CAST(ng AS INT))) AS t(i)),
              first AS (SELECT h, MIN(shard) AS fs FROM grams GROUP BY h),
              per_shard AS (SELECT shard, COUNT(*) AS n_distinct
                            FROM grams GROUP BY shard),
              news AS (SELECT fs AS shard, COUNT(*) AS n_new
                       FROM first GROUP BY fs)
              SELECT p.shard, p.n_distinct, COALESCE(nw.n_new, 0) AS n_new,
                     CAST(SUM(COALESCE(nw.n_new, 0)) OVER (ORDER BY p.shard
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_new
              FROM per_shard p LEFT JOIN news nw ON nw.shard = p.shard
              ORDER BY p.shard""")),

    // Simplified silhouette per quantizer cell (centroid form: a =
    // squared distance to the OWN centroid, b = to the nearest OTHER
    // centroid, s = (b-a)/b — the standard k-means quality audit that
    // pairs with q142/q273/q304: a cell with low mean silhouette is
    // where SemDeDup's representative pruning loses recall first).
    // The audit runs over a SAMPLE, not the corpus: an n×k distance
    // pass for a quality STATISTIC is the wrong trade once n grows
    // (the round-11 full-corpus form measured 26× wall at 64× — both
    // the m×k work and k itself grow with n). The sample is the
    // Corpus.sampleFlag discipline widened to two md5 hex chars
    // (fractions of 1/256): the keep-fraction ceil(256·512/n)/256
    // targets ~512 sampled vectors at ANY corpus size — the audit
    // cost is m×k ~ 512·sqrt(n), sublinear — and degrades to
    // fraction 1 (exact audit, bit-identical to the round-11 form)
    // whenever the corpus is small enough that sampling would save
    // nothing (n ≤ ~527). Deterministic, partition-invariant, and
    // mirrored in SQL, so the sampled statistic is hash-verified
    // like everything else; cells none of whose members are sampled
    // drop from the audit (they hold <1/512th of the corpus).
    // Ranked by (d2, cell) per sampled vector; the per-row double
    // division is floor-quantized to basis points BEFORE aggregation
    // so every cross-row sum is exact-integer (q295's pinned-mass
    // trick; d2 is the left-associated 64-term sum both engines fold
    // identically).
    QueryDef("q307_cell_silhouette",
      (s, d) => {
        val fv = table(s, d, "embeddings").select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        val n = fv.count()
        val k = math.max(8L, math.ceil(math.sqrt(n.toDouble)).toLong)
        val cc = fv.filter(col("vec_id") < k)
          .select(col("vec_id").as("cell"), col("v").as("cv"))
        // max(1, n) in the divisor: an EMPTY embeddings table must
        // yield an empty audit, not an ArithmeticException at plan
        // build (frac256 then clamps to 256 = exact regime over no
        // rows; the oracle mirrors with GREATEST(COUNT(*), 1))
        val frac256 = math.min(256L,
          math.max(1L, (256L * 512L + n - 1) / math.max(1L, n)))
        val sampled =
          if (frac256 >= 256L) fv
          else fv.filter(
            substring(md5(concat(lit("sil:"),
              col("vec_id").cast("string"))), 1, 2) < lit(f"$frac256%02x"))
        val sq = "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, x) -> acc + x)"
        val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cell"))
        val ab = sampled.crossJoin(broadcast(cc))
          .withColumn("d2", expr(sq))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .groupBy("vec_id")
          .agg(max(when(col("rn") === 1, col("cell"))).as("cell"),
            max(when(col("rn") === 1, col("d2"))).as("a"),
            max(when(col("rn") === 2, col("d2"))).as("b"))
        ab.withColumn("s_bp", expr(
            "CASE WHEN b <= 0.0 THEN 0 " +
            "ELSE CAST(FLOOR((10000.0 * (b - a)) / b) AS BIGINT) END"))
          .groupBy("cell")
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("s_bp")).as("sum_s_bp"),
            min(col("s_bp")).as("min_s_bp"))
          .withColumn("mean_s_bp", expr("sum_s_bp div n_vecs"))
          .select("cell", "n_vecs", "mean_s_bp", "min_s_bp")
          .orderBy("cell")
      },
      Some(s"""WITH emb AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
              p AS (SELECT LEAST(256, GREATEST(1,
                       (256 * 512 + COUNT(*) - 1) // GREATEST(COUNT(*), 1))) AS c
                    FROM embeddings),
              cc AS (SELECT vec_id AS cell, v AS cv FROM emb
                     WHERE vec_id < (SELECT GREATEST(8,
                         CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))
                       FROM embeddings)),
              sv AS (SELECT * FROM emb
                     WHERE (SELECT c FROM p) >= 256
                        OR substring(md5('sil:' || CAST(vec_id AS VARCHAR)),
                             1, 2) < printf('%02x', (SELECT c FROM p))),
              rk AS (SELECT vec_id, cell, d2,
                            ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d2, cell) AS rn FROM (
                       SELECT e.vec_id, cc.cell,
                              ${d2Sql("e.v", "cc.cv")} AS d2
                       FROM sv e JOIN cc ON TRUE)),
              ab AS (SELECT vec_id,
                            MAX(CASE WHEN rn = 1 THEN cell END) AS cell,
                            MAX(CASE WHEN rn = 1 THEN d2 END) AS a,
                            MAX(CASE WHEN rn = 2 THEN d2 END) AS b
                     FROM rk WHERE rn <= 2 GROUP BY vec_id),
              sc AS (SELECT cell,
                            CASE WHEN b <= 0.0 THEN 0
                                 ELSE CAST(FLOOR((10000.0 * (b - a)) / b) AS BIGINT)
                            END AS s_bp
                     FROM ab)
              SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                     CAST(SUM(s_bp) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_s_bp,
                     MIN(s_bp) AS min_s_bp
              FROM sc GROUP BY cell ORDER BY cell""")),

    // Boilerplate coverage (the CCNet/RefinedWeb template signal):
    // a token 3-gram is boilerplate when it appears in >= 40% of the
    // corpus' SOURCES (count-derived threshold — GREATEST(2,
    // 2*n_sources div 5) — so the gate tracks the source census, not
    // a pinned constant); each source is then scored by the fraction
    // of its gram POSITIONS covered by boilerplate, per-mille
    // integers. A crawler whose docs are mostly cross-source
    // boilerplate is template spam regardless of its per-doc quality
    // scores. Shuffles: one (source, gram) distinct + one gram df
    // (both vocab-sized), one gram->bp semi-join keyed by hash — no
    // doc-pair stage at all.
    QueryDef("q308_boilerplate_coverage",
      (s, d) => {
        val docs = table(s, d, "documents")
        val ns = docs.select("source").distinct().count()
        val thresh = math.max(2L, (2L * ns) / 5L)
        val tokd = docs
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
          .withColumn("ng", (size(col("toks")) - 2).cast(LongType))
          .filter(col("ng") >= 1)
        val grams = tokd
          .select(col("doc_id"), col("source"), col("ng"), explode(
            expr("transform(sequence(1, CAST(ng AS INT)), " +
              "i -> md5(concat_ws(' ', slice(toks, i, 3))))")).as("h"))
        val bp = grams.select("source", "h").distinct()
          .groupBy("h").agg(count(lit(1)).as("df_src"))
          .filter(col("df_src") >= thresh).select("h")
        val perDoc = grams.join(bp, Seq("h"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_bp"))
        tokd.select("doc_id", "source", "ng")
          .join(perDoc, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_bp"))
          .withColumn("pm", expr("(n_bp * 1000) div ng"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bp")).as("sb"), sum(col("ng")).as("sg"),
            max(col("pm")).as("max_pm"))
          .withColumn("tot_pm", expr("(sb * 1000) div sg"))
          .select("source", "n_docs", "tot_pm", "max_pm")
          .orderBy("source")
      },
      Some("""WITH tokd AS (SELECT doc_id, source,
                       string_split(text, ' ') AS toks,
                       CAST(len(string_split(text, ' ')) - 2 AS BIGINT) AS ng
                   FROM documents
                   WHERE len(string_split(text, ' ')) - 2 >= 1),
              grams AS (
                SELECT doc_id, source, ng,
                       md5(array_to_string(toks[t.i:t.i+2], ' ')) AS h
                FROM tokd, UNNEST(generate_series(1, CAST(ng AS INT))) AS t(i)),
              bp AS (SELECT h FROM (
                       SELECT h, COUNT(DISTINCT source) AS df_src
                       FROM grams GROUP BY h)
                     WHERE df_src >= GREATEST(2,
                       (2 * (SELECT COUNT(DISTINCT source) FROM documents)) // 5)),
              pd AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bp
                     FROM grams g JOIN bp ON bp.h = g.h GROUP BY g.doc_id),
              sc AS (SELECT t.source, t.ng, COALESCE(p.n_bp, 0) AS n_bp,
                            (COALESCE(p.n_bp, 0) * 1000) // t.ng AS pm
                     FROM tokd t LEFT JOIN pd p ON p.doc_id = t.doc_id)
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     (CAST(SUM(n_bp) AS BIGINT) * 1000) //
                       CAST(SUM(ng) AS BIGINT) AS tot_pm,
                     MAX(pm) AS max_pm
              FROM sc GROUP BY source ORDER BY source""")),

    // Effective sample size of the q294 DSIR importance weights: the
    // go/no-go number BEFORE importance-sampling a corpus — if
    // ESS/n collapses, the weighted sample is dominated by a few
    // docs and the selection is noise. Per-token integer surprisal
    // ratios (q294's LM) average into an integer exponent per doc;
    // the weight is the power-of-2 it denotes, clamped to [2^-4,2^4]
    // and scaled by 16 so all weights are exact BIGINTs (1..256).
    // ESS = (sum w)^2 / (sum w^2) — exact integer arithmetic, per
    // source; ess_pm = ESS/n in per-mille. One corpus pass for the
    // LM (64-bucket broadcast), one for scoring — the q294 shape.
    QueryDef("q309_ess_importance",
      (s, d) => {
        val B = 64
        val toks = table(s, d, "documents")
          .select(col("doc_id"), col("source"), col("lang"),
            explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0)
          .withColumn("b", expr(Extras29.slot("w", B)))
          .transform(graft.ops.Pinned.pin) // two consumers: LM build and doc scoring
        val raw = toks.groupBy("b").agg(count(lit(1)).as("r_cnt"))
        val tgt = toks.filter(col("lang") === "en")
          .groupBy("b").agg(count(lit(1)).as("t_cnt"))
        val lm = raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("t_cnt"))
          .select(col("b"),
            (length(bin(col("t_cnt") + 1)) - length(bin(col("r_cnt") + 1)))
              .cast(LongType).as("wq"))
        val perDoc = toks.join(broadcast(lm), "b")
          .groupBy("doc_id", "source")
          .agg(sum("wq").as("wsum"), count(lit(1)).as("n_toks"))
          // exponent = clamp(avg per-token log2 ratio, -4..4); weight
          // = 2^(exponent+4) in 1..256 (the *16 scale cancels in ESS)
          .withColumn("e", expr("GREATEST(-4L, LEAST(4L, wsum div n_toks))"))
          .withColumn("wt", expr("CAST(POW(2.0, CAST(e + 4 AS DOUBLE)) AS BIGINT)"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("wt")).as("sw"),
            sum(col("wt") * col("wt")).as("sw2"))
          // sw <= 256*n, so sw*sw*1000 overflows int64 near 6M docs
          // per source; the numerator rides DECIMAL(38,0) (exact to
          // ~1e38 — n up to ~1e16) and only the <=1000 quotient
          // returns to BIGINT. DuckDB mirror: HUGEINT intermediates.
          .withColumn("ess_pm", expr(
            "CAST((CAST(sw AS DECIMAL(38,0)) * CAST(sw AS DECIMAL(38,0)) " +
              "* 1000) div (CAST(n_docs AS DECIMAL(38,0)) " +
              "* CAST(sw2 AS DECIMAL(38,0))) AS BIGINT)"))
          .select("source", "n_docs", "sw", "sw2", "ess_pm")
          .orderBy("source")
      },
      Some(s"""WITH t2 AS (SELECT doc_id, source, lang, w,
                          ${Extras29.slotDuck("w", 64)} AS b
                        FROM (SELECT doc_id, source, lang,
                                unnest(string_split(text, ' ')) AS w
                              FROM documents)
                        WHERE len(w) > 0),
              raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r_cnt
                      FROM t2 GROUP BY b),
              tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS t_cnt
                      FROM t2 WHERE lang = 'en' GROUP BY b),
              lm AS (SELECT raw.b,
                       CAST(LENGTH(BIN(COALESCE(t_cnt, 0) + 1)) -
                            LENGTH(BIN(r_cnt + 1)) AS BIGINT) AS wq
                     FROM raw LEFT JOIN tgt ON tgt.b = raw.b),
              pd AS (SELECT t2.doc_id, t2.source,
                       CAST(SUM(wq) AS BIGINT) AS wsum,
                       CAST(COUNT(*) AS BIGINT) AS n_toks
                     FROM t2 JOIN lm ON lm.b = t2.b GROUP BY 1, 2),
              wts AS (SELECT source,
                        CAST(POW(2.0, CAST(GREATEST(-4, LEAST(4,
                          wsum // n_toks)) + 4 AS DOUBLE)) AS BIGINT) AS wt
                      FROM pd)
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(wt) AS BIGINT) AS sw,
                     CAST(SUM(wt * wt) AS BIGINT) AS sw2,
                     CAST((CAST(SUM(wt) AS HUGEINT) * CAST(SUM(wt) AS HUGEINT)
                         * 1000) //
                       (CAST(COUNT(*) AS HUGEINT) * CAST(SUM(wt * wt) AS HUGEINT))
                       AS BIGINT) AS ess_pm
              FROM wts GROUP BY source ORDER BY source""")),

    // Cross-source duplication matrix over WINNOWING fingerprints:
    // MOSS's candidate stage at corpus scale — docs meet only
    // through selected fingerprints (a ~2/(w+1) sample of gram
    // positions with a shared-run guarantee), never via all-pairs.
    // The q129 hot-key contract caps any fingerprint's posting list
    // at 64 docs, bounding pair expansion at 2016*vocab no matter
    // the corpus; the output is the source-pair matrix (which
    // crawls duplicate each other) that complements q287's
    // benchmark-contamination matrix. Pair counts are distinct doc
    // pairs sharing >= 2 selected fingerprints.
    QueryDef("q310_winnow_dup_matrix",
      (s, d) => {
        val tokd = table(s, d, "documents")
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
          .withColumn("ng", (size(col("toks")) - 2).cast(LongType))
          .filter(col("ng") >= 4)
        val grams = tokd
          .select(col("doc_id"), col("source"), col("ng"), posexplode(
            expr("transform(sequence(1, CAST(ng AS INT)), " +
              "i -> md5(concat_ws(' ', slice(toks, i, 3))))")))
          .select(col("doc_id"), col("source"), col("ng"),
            (col("pos") + 1).cast(LongType).as("p"), col("col").as("h"))
        // selection as ONE doc-ordered window pass, no 4x explode, no
        // wins self-join — ops/Dedup.winnowSelect in its tie-INCLUSIVE
        // form (every position holding a window min): this query
        // consumes the DISTINCT fingerprint set, which is identical
        // under either tie rule, and the oracle states the explicit
        // window/offset form with the same inclusive predicate. The
        // r13 form materialized 4x the gram volume and re-ran the
        // gram lineage twice (groupBy + join); bit-identical.
        val fp = graft.ops.Dedup
          .winnowSelect(grams, "doc_id", w = 4, rightmostTies = false)
          .select(col("doc_id"), col("source"), col("h")).distinct()
        // Round 18 (guide §2.3/§2.4): the old (df-count + join + fpc
        // self-join) form planned the corpus-sized gram-md5 + winnow
        // lineage TWICE (two parquet scans in the static plan — the
        // rare path and the fpc sides; only the a/b sides shared a
        // ReusedExchange). One bucket aggregate on h now applies the
        // q129 hot-key cap (size(m) <= 64 == df <= 64, fp is distinct
        // so each doc appears once per h) and expands pairs in-bucket
        // — the lshCandidatePairsFromBands shape: fp has a single
        // consumer, ONE corpus pass, no self-join; posting lists are
        // sorted by doc_id so d1 < d2 by construction, and each
        // shared h contributes exactly one (d1, d2) row, as the join
        // did. Pair counts are bit-identical.
        val buckets = fp
          .groupBy("h")
          .agg(sort_array(collect_list(struct(col("doc_id"), col("source"))))
            .as("m"))
          .filter(size(col("m")) >= 2 && size(col("m")) <= 64)
        val pairs = buckets
          .select(posexplode(col("m")).as(Seq("__i", "a")), col("m"))
          .select(col("a"),
            explode(slice(col("m"), col("__i") + 2, size(col("m")))).as("b"))
          .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
            col("a.source").as("sa"), col("b.source").as("sb"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
        pairs.select(least(col("sa"), col("sb")).as("src1"),
            greatest(col("sa"), col("sb")).as("src2"))
          .groupBy("src1", "src2").agg(count(lit(1)).as("n_pairs"))
          .orderBy("src1", "src2")
      },
      Some("""WITH tokd AS (SELECT doc_id, source,
                       string_split(text, ' ') AS toks,
                       CAST(len(string_split(text, ' ')) - 2 AS BIGINT) AS ng
                   FROM documents
                   WHERE len(string_split(text, ' ')) - 2 >= 4),
              grams AS (
                SELECT doc_id, source, ng, CAST(t.i AS BIGINT) AS p,
                       md5(array_to_string(toks[t.i:t.i+2], ' ')) AS h
                FROM tokd, UNNEST(generate_series(1, CAST(ng AS INT))) AS t(i)),
              x AS (
                SELECT doc_id, source, p - t.off AS w, p, h
                FROM grams, UNNEST([0,1,2,3]) AS t(off)
                WHERE p - t.off >= 1 AND p - t.off <= ng - 3),
              wins AS (SELECT doc_id, w, MIN(h) AS wmin
                       FROM x GROUP BY doc_id, w),
              fp AS (SELECT DISTINCT x.doc_id, x.source, x.h
                     FROM x JOIN wins ON x.doc_id = wins.doc_id AND x.w = wins.w
                     WHERE x.h = wins.wmin),
              rare AS (SELECT h FROM (
                         SELECT h, COUNT(*) AS df FROM fp GROUP BY h)
                       WHERE df <= 64),
              fpc AS (SELECT fp.* FROM fp JOIN rare ON rare.h = fp.h),
              pairs AS (
                SELECT a.doc_id AS d1, b.doc_id AS d2,
                       a.source AS sa, b.source AS sb,
                       COUNT(*) AS n_shared
                FROM fpc a JOIN fpc b
                  ON a.h = b.h AND a.doc_id < b.doc_id
                GROUP BY 1, 2, 3, 4
                HAVING COUNT(*) >= 2)
              SELECT LEAST(sa, sb) AS src1, GREATEST(sa, sb) AS src2,
                     CAST(COUNT(*) AS BIGINT) AS n_pairs
              FROM pairs GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
