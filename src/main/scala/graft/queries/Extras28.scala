package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Graph, Similarity}
import QueryDef.table

/** Round-9 widening: training-data pipeline LEARNING steps — the ops
  * that turn a curated corpus into model inputs. Everything before
  * this round filtered/deduped/tokenized with FIXED parameters; these
  * queries LEARN parameters from the corpus itself, each as ordinary
  * Catalyst plans:
  *
  *   - q281 BPE merge induction (vocabulary learning over the
  *     distinct-word frame — the value-domain-bounded form)
  *   - q282 majority label propagation (community detection, the
  *     Pregel superstep as join+argmax)
  *   - q283 hard-negative mining for contrastive training (LSH-blocked
  *     cross-label top-k)
  *   - q284 logistic-regression training with quantized gradients
  *     (integer-exact distributed GD — no double-summation-order
  *     nondeterminism anywhere)
  *   - q285 OOV-rate-vs-vocab-size curve (the tokenizer-budget
  *     planning table)
  *
  * Determinism notes: all cross-row accumulation is over BIGINTs
  * (counts, quantized gradients) — order-insensitive by construction;
  * per-row double math is identical pinned expression trees on both
  * engines; ranks tie-break on explicit key columns.
  */
object Extras28 {

  /** md5-hash a token into one of 8 feature slots (the q261 hashing
    * trick, shared by train and inference so a model trained here
    * could score there). */
  private def featSlot(tok: String): String =
    s"(CAST(conv(substring(md5($tok), 1, 4), 16, 10) AS BIGINT) % 8)"
  private def featSlotDuck(tok: String): String =
    s"(CAST(CAST('0x' || substr(md5($tok), 1, 4) AS INTEGER) AS BIGINT) % 8)"

  /** The distinct-word frame BPE induction runs over: one word-count
    * shuffle collapses the corpus to its value domain, then every
    * merge round is value-domain-sized. Shared by q281 (induction)
    * and q55 (encode/apply). */
  private[queries] def bpeWordFrame(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    table(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("seq", expr("trim(regexp_replace(word, '(.)', '$1 '))"))
      .transform(graft.ops.Pinned.pin) // distinct-word frame: value-domain-sized

  /** One BPE merge round over the word frame: count adjacent symbol
    * pairs (frequency-weighted), pick the max (ties to the
    * lexicographically first pair), rewrite every word's
    * segmentation with a boundary-guarded literal replace. Returns
    * (merged frame, 1-row best-pair frame).
    *
    * Pin discipline (round 18): a checkpoint only pays when its
    * frame is re-read. `pinBest` — q281 reads each round's best pair
    * twice (the merge rewrite AND the output row); q55 discards the
    * pair frames, so its single consumer (the rewrite) inlines the
    * pairs aggregate instead of paying a barrier. `pinMerged` — the
    * NEXT round re-reads the merged frame twice (pairs + rewrite),
    * but the LAST round's frame has one consumer in both callers
    * (q281's token sum, q55's vocab projection) and rides the main
    * job unpinned. Both choices are pure barrier-count folds: the
    * selection is deterministic (total tie-break on (cnt, pair)), so
    * pinning never affected values. */
  private[queries] def bpeRound(w: DataFrame, pinBest: Boolean = true,
      pinMerged: Boolean = true): (DataFrame, DataFrame) = {
    val pairs = w
      .select(col("freq"), expr("split(seq, ' ')").as("sy"))
      .select(col("freq"), explode(expr(
        "CASE WHEN size(sy) < 2 THEN CAST(array() AS ARRAY<STRING>) " +
          "ELSE transform(sequence(0, size(sy) - 2), " +
          "i -> concat(sy[i], ' ', sy[i + 1])) END")).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
    val best0 = pairs.orderBy(col("cnt").desc, col("pair")).limit(1)
    val best = if (pinBest) best0.transform(graft.ops.Pinned.pin) else best0
    val merged0 = w.crossJoin(broadcast(best))
      .withColumn("seq", expr(
        "trim(replace(concat(' ', seq, ' '), concat(' ', pair, ' '), " +
          "concat(' ', replace(pair, ' ', ''), ' ')))"))
      .select("word", "freq", "seq")
    val merged =
      if (pinMerged) merged0.transform(graft.ops.Pinned.pin) else merged0
    (merged, best)
  }

  /** DuckDB CTE chain words/w0/p1..b1..w1/../w3 mirroring three
    * [[bpeRound]]s — shared verbatim by the q281 and q55 oracles so
    * both engines run the identical induction. */
  private[queries] val bpeSqlCtes: String = {
    def rnd(i: Int) = s"""
              p$i AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
                      FROM (SELECT freq,
                              unnest([sy[j] || ' ' || sy[j + 1]
                                      for j in range(1, len(sy))]) AS pair
                            FROM (SELECT freq, string_split(seq, ' ') AS sy
                                  FROM w${i - 1}))
                      GROUP BY pair),
              b$i AS (SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
              w$i AS (SELECT word, freq,
                        trim(replace(' ' || seq || ' ', ' ' || b.pair || ' ',
                             ' ' || replace(b.pair, ' ', '') || ' ')) AS seq
                      FROM w${i - 1}, b$i b)"""
    s"""words AS (
              SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
              FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
              WHERE len(word) > 0 GROUP BY word),
            w0 AS (SELECT word, freq,
                     trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
                   FROM words),
            ${rnd(1)},
            ${rnd(2)},
            ${rnd(3)}"""
  }

  val all: Seq[QueryDef] = Seq(

    // BPE vocabulary induction at corpus scale: 3 merge rounds, each
    // one aggregate over the DISTINCT-WORD frame (weighted by word
    // frequency) — the whole corpus collapses to its value domain
    // first, so a 100 TB corpus costs one word-count shuffle and the
    // merge loop then runs over millions of distinct words, not
    // trillions of tokens. Pair selection is the standard max-count
    // (overlapping-count heuristic, ties to the lexicographically
    // first pair); merge application is a boundary-guarded literal
    // replace — an immediately-adjacent repeat of the merged pair
    // (e.g. "a a a a" under merge "a a") defers its second merge to
    // the next round, identically on both engines. Emits per round:
    // the chosen pair, its weighted count, and the corpus token count
    // after applying the merge — the compression-curve a tokenizer
    // budget is planned against.
    QueryDef("q281_bpe_merges",
      (s, d) => {
        val words = bpeWordFrame(s, d)
        val (w1, b1) = bpeRound(words)
        val (w2, b2) = bpeRound(w1)
        val (w3, b3) = bpeRound(w2, pinMerged = false) // w3: statRow only
        def statRow(r: Int, b: DataFrame, w: DataFrame) =
          b.crossJoin(w.agg(
            sum(col("freq") * size(split(col("seq"), " ")).cast(LongType))
              .as("tokens_after")))
            .select(lit(r).as("round"), col("pair"), col("cnt"),
              col("tokens_after"))
        statRow(1, b1, w1).unionAll(statRow(2, b2, w2))
          .unionAll(statRow(3, b3, w3)).orderBy("round")
      },
      Some {
        def stat(i: Int) =
          s"""SELECT $i AS round, pair, cnt,
                (SELECT CAST(SUM(freq * len(string_split(seq, ' '))) AS BIGINT)
                 FROM w$i) AS tokens_after FROM b$i"""
        s"""WITH $bpeSqlCtes
            ${stat(1)} UNION ALL ${stat(2)} UNION ALL ${stat(3)}
            ORDER BY round"""
      }),

    // synchronous majority label propagation (2 rounds) over the part
    // co-occurrence graph — community detection as the Pregel
    // superstep: each round is one edges-to-labels equi-join plus one
    // per-node argmax (most frequent neighbor label, ties to the
    // smallest label — a deterministic min-struct, not a sampled
    // tie-break). Labels start as node ids; after round 1 every node
    // holds its min neighbor id, after round 2 genuine neighborhoods
    // have converged onto shared labels. Scale shape: each round
    // shuffles (edge endpoints x label) pairs — degree-bounded like
    // q132's PageRank, with no vertex ever holding more state than
    // one label.
    QueryDef("q282_label_propagation",
      (s, d) => {
        val e = Graph.coOccurrenceEdges(
          table(s, d, "lineitem"), "l_orderkey", "l_partkey")
          .transform(graft.ops.Pinned.pin) // both directions of the symmetrize read it
        val sym = e.select(col("u").as("src"), col("v").as("dst"))
          .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
        // the factored op (Graph.labelPropagation) — same superstep
        // plans, plus per-round pin release and the vertexCount route
        // for corpora whose label frame outgrows broadcast
        val l2 = Graph.labelPropagation(sym, rounds = 2)
        graft.ops.Pinned.release(e) // l2 is checkpointed; the edge pin is done
        l2.groupBy(col("label").as("community"))
          .agg(count(lit(1)).as("size"),
            min("node").as("min_node"), max("node").as("max_node"))
          .orderBy(col("size").desc, col("community"))
          .limit(10)
      },
      Some("""WITH e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
                          FROM lineitem a JOIN lineitem b
                            ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey),
              sym AS (SELECT u AS src, v AS dst FROM e0
                      UNION ALL SELECT v, u FROM e0),
              n0 AS (SELECT DISTINCT src AS node FROM sym),
              l0 AS (SELECT node, node AS label FROM n0),
              c1 AS (SELECT s.src, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM sym s JOIN l0 l ON l.node = s.dst
                     GROUP BY s.src, l.label),
              r1 AS (SELECT src, label, ROW_NUMBER() OVER
                       (PARTITION BY src ORDER BY cnt DESC, label) AS rn
                     FROM c1),
              l1 AS (SELECT n.node, COALESCE(r.label, n.node) AS label
                     FROM n0 n LEFT JOIN
                       (SELECT src, label FROM r1 WHERE rn = 1) r
                       ON r.src = n.node),
              c2 AS (SELECT s.src, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM sym s JOIN l1 l ON l.node = s.dst
                     GROUP BY s.src, l.label),
              r2 AS (SELECT src, label, ROW_NUMBER() OVER
                       (PARTITION BY src ORDER BY cnt DESC, label) AS rn
                     FROM c2),
              l2 AS (SELECT n.node, COALESCE(r.label, n.node) AS label
                     FROM n0 n LEFT JOIN
                       (SELECT src, label FROM r2 WHERE rn = 1) r
                       ON r.src = n.node)
              SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS size,
                     MIN(node) AS min_node, MAX(node) AS max_node
              FROM l2 GROUP BY label
              ORDER BY size DESC, community LIMIT 10""")),

    // hard-negative mining for contrastive training: for each anchor
    // (a deterministic 1-in-7 id sample), the top-3 most-similar
    // vectors carrying a DIFFERENT class label — the pairs a
    // contrastive loss learns the most from, and exactly the mining
    // step behind embedding-model curricula. Blocked by the sign-LSH
    // bucket (similar vectors collide), so the candidate join is an
    // equi-join touching ~1/2^bits of the anchor x corpus pair space
    // — never all-pairs. At 100 TB the bucket key is also the
    // partition key, so each executor mines its own bucket locally.
    //
    // `bits` is DERIVED from the corpus count — the sizing contract
    // on Similarity.hardNegatives (bits ~ log2(corpus/targetBucket),
    // targetBucket = 64) applied, not just documented: buckets stay
    // ~64 vectors at any scale, so per-anchor candidate work is flat
    // where a pinned bits went quadratic (round-9 64× probe: 18.3 s).
    // Pure-integer formula (ceil-div + binary-digit count) so the
    // oracle reproduces it exactly — no float log2 half-cases.
    QueryDef("q283_hard_negatives",
      (s, d) => {
        val emb = table(s, d, "embeddings")
        // the shared sizing contract — Similarity.derivedBits is the
        // ONE definition, mirrored verbatim in the oracle below
        val bits = Similarity.derivedBits(emb.count())
        Similarity.hardNegatives(emb,
            anchorPred = col("vec_id") % 7 === 0, k = 3, bits = bits)
          .orderBy("a_id", "rank")
      },
      Some {
        // same integer sizing (the shared derivedBitsSql fragment),
        // max-16-bit sign string truncated to the derived width
        val bucketSql = (1 to 16).map(i =>
          s"(CASE WHEN embedding[$i] > 0 THEN '1' ELSE '0' END)")
          .mkString(" || ")
        s"""WITH p AS (${Similarity.derivedBitsSql("embeddings")}),
               b AS (SELECT vec_id, label, embedding,
                         substr($bucketSql, 1, (SELECT bits FROM p)) AS bucket
                       FROM embeddings),
            pairs AS (
              SELECT a.vec_id AS a_id, a.label AS a_label,
                     c.vec_id AS c_id, c.label AS c_label,
                     list_cosine_similarity(
                       list_transform(a.embedding, v -> CAST(v AS DOUBLE)),
                       list_transform(c.embedding, v -> CAST(v AS DOUBLE))) AS cos
              FROM b a JOIN b c ON a.bucket = c.bucket
              WHERE a.vec_id % 7 = 0 AND c.label <> a.label),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER
                (PARTITION BY a_id ORDER BY cos DESC, c_id) AS rank
              FROM pairs)
            SELECT a_id, CAST(rank AS INT) AS rank, c_id, a_label, c_label, cos
            FROM ranked WHERE rank <= 3
            ORDER BY a_id, rank"""
      }),

    // logistic-regression TRAINING at corpus scale (2 full-batch
    // gradient steps; q261 is the inference half): hashed bag-of-words
    // features, fast-sigmoid activation z/(1+|z|) (division and abs —
    // correctly rounded IEEE ops, portable where exp is not), and
    // QUANTIZED gradients: every cross-row accumulation is a BIGINT
    // sum of floor(residual * 2^20) * count values — exact and
    // summation-order-free, the same trick distributed training uses
    // for gradient compression, here buying bit-reproducibility. The
    // scale shape is two map-reduce passes over the corpus, each
    // shuffling 8 longs per partition after map-side combine; weights
    // move driver-free through a 1-row broadcast.
    QueryDef("q284_lr_train",
      (s, d) => {
        val F = 8
        val feats = table(s, d, "documents")
          .select(col("doc_id"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"),
            split(col("text"), " ").as("w"))
          .select(Seq(col("doc_id"), col("y")) ++ (0 until F).map(f =>
            expr(s"CAST(size(filter(w, t -> ${featSlot("t")} = $f)) AS BIGINT)")
              .as(s"x$f")): _*)
          .transform(graft.ops.Pinned.pin) // feeds both gradient passes
        // step 1: w=0 -> p=1/2 exactly -> residual quantizes to +-2^19
        val a1 = feats.agg(
          count(lit(1)).as("n"),
          (0 until F).map(f =>
            sum(((col("y") * 2 - 1) * 524288L) * col(s"x$f")).as(s"g1_$f")): _*)
        val w1 = a1.select(Seq(col("n")) ++ (0 until F).flatMap(f => Seq(
          col(s"g1_$f"),
          (col(s"g1_$f").cast(DoubleType) * 0.1 /
            (col("n").cast(DoubleType) * 1048576.0)).as(s"w1_$f"))): _*)
        // step 2: z from quantized per-feature terms (order-free sum
        // of longs), fast-sigmoid, quantized residual
        val zq = (0 until F).map(f =>
          expr(s"CAST(floor(w1_$f * CAST(x$f AS DOUBLE) * 1048576.0) AS BIGINT)"))
          .reduce(_ + _)
        val scored = feats.crossJoin(broadcast(w1))
          .withColumn("zq", zq)
          .withColumn("z", col("zq").cast(DoubleType) / 1048576.0)
          .withColumn("p",
            lit(0.5) * (lit(1.0) + col("z") / (lit(1.0) + abs(col("z")))))
          .withColumn("r2q", expr(
            "CAST(floor((CAST(y AS DOUBLE) - p) * 1048576.0) AS BIGINT)"))
        val a2 = scored.agg(
          max("n").as("n"),
          (0 until F).map(f =>
            sum(col("r2q") * col(s"x$f")).as(s"g2_$f")) ++
          (0 until F).flatMap(f => Seq(
            max(s"g1_$f").as(s"g1_$f"), max(s"w1_$f").as(s"w1_$f"))) ++
          Seq(sum(when((col("zq") > 0) === (col("y") === 1), 1L)
            .otherwise(0L)).as("n_correct1")): _*)
        val withW2 = a2.select(Seq(col("n"), col("n_correct1")) ++
          (0 until F).flatMap(f => Seq(
            col(s"g1_$f"), col(s"w1_$f"), col(s"g2_$f"),
            (col(s"w1_$f") +
              col(s"g2_$f").cast(DoubleType) * 0.1 /
                (col("n").cast(DoubleType) * 1048576.0)).as(s"w2_$f"))): _*)
        val stackArgs = (0 until F).map(f =>
          s"$f, g1_$f, w1_$f, g2_$f, w2_$f").mkString(", ")
        withW2.select(
          expr(s"stack($F, $stackArgs) AS (f, g1, w1, g2, w2)"),
          col("n").as("n_docs"), col("n_correct1"))
          .orderBy("f")
      },
      Some {
        val F = 8
        val xs = (0 until F).map(f =>
          s"""CAST(len(list_filter(w, t -> ${featSlotDuck("t")} = $f))
                AS BIGINT) AS x$f""").mkString(",\n                ")
        val g1s = (0 until F).map(f =>
          s"CAST(SUM(((y * 2 - 1) * 524288) * x$f) AS BIGINT) AS g1_$f")
          .mkString(",\n                ")
        val w1s = (0 until F).map(f =>
          s"CAST(g1_$f AS DOUBLE) * 0.1 / (CAST(n AS DOUBLE) * 1048576.0) AS w1_$f")
          .mkString(",\n                ")
        val zTerms = (0 until F).map(f =>
          s"CAST(floor(w1.w1_$f * CAST(f.x$f AS DOUBLE) * 1048576.0) AS BIGINT)")
          .mkString(" + ")
        val g2s = (0 until F).map(f =>
          s"CAST(SUM(r2q * x$f) AS BIGINT) AS g2_$f").mkString(",\n                ")
        val outRows = (0 until F).map(f =>
          s"""SELECT $f AS f, a1.g1_$f AS g1, w1.w1_$f AS w1, a2.g2_$f AS g2,
                w1.w1_$f + CAST(a2.g2_$f AS DOUBLE) * 0.1 /
                  (CAST(a1.n AS DOUBLE) * 1048576.0) AS w2,
                a1.n AS n_docs, a2.n_correct1
              FROM a1, w1, a2""").mkString("\n              UNION ALL\n              ")
        s"""WITH docs AS (
              SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                     string_split(text, ' ') AS w
              FROM documents),
            feats AS (
              SELECT doc_id, y,
                $xs
              FROM docs),
            a1 AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                $g1s
              FROM feats),
            w1 AS (
              SELECT n,
                $w1s
              FROM a1),
            scored AS (
              SELECT f.y, ${(0 until F).map(f => s"f.x$f").mkString(", ")},
                     zq, CAST(zq AS DOUBLE) / 1048576.0 AS z
              FROM (SELECT *, $zTerms AS zq
                    FROM feats f, w1) f),
            resid AS (
              SELECT *,
                CAST(floor((CAST(y AS DOUBLE) -
                  (0.5 * (1.0 + z / (1.0 + abs(z))))) * 1048576.0) AS BIGINT)
                  AS r2q
              FROM scored),
            a2 AS (
              SELECT
                $g2s,
                CAST(SUM(CASE WHEN (zq > 0 AND y = 1) OR (zq <= 0 AND y = 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct1
              FROM resid)
              $outRows
              ORDER BY f"""
      }),

    // OOV-rate-vs-vocab-size curve: keep the top-V words by corpus
    // frequency (ties lexicographic) for V in {8, 16, 32} and report
    // what fraction of all TOKEN OCCURRENCES falls outside each vocab
    // — the table a tokenizer budget (and q281's merge count) is
    // chosen against. One word-count shuffle + one rank over the
    // distinct-word frame; the three curve points are conditional
    // sums in a single aggregate, so corpus cost is independent of
    // how many Vs are probed.
    QueryDef("q285_oov_curve",
      (s, d) => {
        val words = table(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) > 0)
          .groupBy("word").agg(count(lit(1)).as("freq"))
        val ranked = words.withColumn("rk",
          row_number().over(Window.orderBy(col("freq").desc, col("word"))))
        val aggCols = Seq(sum(col("freq")).as("total")) ++
          Seq(8, 16, 32).map(v =>
            sum(when(col("rk") <= v, col("freq")).otherwise(0L)).as(s"cov_$v"))
        val agg = ranked.agg(count(lit(1)).as("n_distinct"), aggCols: _*)
        agg.select(expr(
          "stack(3, 8, cov_8, 16, cov_16, 32, cov_32) AS (vocab_size, covered)"),
          col("n_distinct"), col("total"))
          .withColumn("oov_rate",
            lit(1.0) - col("covered").cast(DoubleType) / col("total").cast(DoubleType))
          .select("vocab_size", "n_distinct", "total", "covered", "oov_rate")
          .orderBy("vocab_size")
      },
      Some("""WITH words AS (
                SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
                FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
                WHERE len(word) > 0 GROUP BY word),
              ranked AS (
                SELECT word, freq, ROW_NUMBER() OVER
                  (ORDER BY freq DESC, word) AS rk
                FROM words),
              agg AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
                       CAST(SUM(freq) AS BIGINT) AS total,
                       CAST(SUM(CASE WHEN rk <= 8 THEN freq ELSE 0 END) AS BIGINT) AS cov_8,
                       CAST(SUM(CASE WHEN rk <= 16 THEN freq ELSE 0 END) AS BIGINT) AS cov_16,
                       CAST(SUM(CASE WHEN rk <= 32 THEN freq ELSE 0 END) AS BIGINT) AS cov_32
                FROM ranked)
              SELECT v.vocab_size, a.n_distinct, a.total,
                     CASE v.vocab_size WHEN 8 THEN a.cov_8
                                       WHEN 16 THEN a.cov_16
                                       ELSE a.cov_32 END AS covered,
                     1.0 - CAST(CASE v.vocab_size WHEN 8 THEN a.cov_8
                                       WHEN 16 THEN a.cov_16
                                       ELSE a.cov_32 END AS DOUBLE) /
                           CAST(a.total AS DOUBLE) AS oov_rate
              FROM agg a, (VALUES (8), (16), (32)) AS v(vocab_size)
              ORDER BY v.vocab_size""")),

    // MinHash-LSH band/row tradeoff sweep: precision AND recall of
    // the banding candidate generator against exact ground truth
    // (word-set Jaccard >= 0.5), for (bands x rows) in {8x2, 4x4,
    // 2x8} over 16 shared minhashes — the S-curve table that picks
    // LSH parameters for a 100 TB dedup run before committing to it.
    // Truth is exact all-pairs over a deterministic 1-in-10 doc
    // sample (the eval-on-a-sample pattern of q97/q270: the
    // parameter choice needs a few thousand pairs, never the full
    // corpus); the three configs share ONE signature computation,
    // and empty candidate sets still emit their config row (fixed
    // VALUES domain LEFT JOIN — an all-miss config must show up as
    // recall 0, not vanish).
    QueryDef("q286_lsh_tradeoff",
      (s, d) => {
        import graft.ops.Dedup
        val sample = table(s, d, "documents")
          .filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text"))
          .transform(graft.ops.Pinned.pin) // truth + three config sweeps re-read it
        val dw = sample.select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("w"))
        val sizes = dw.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val truth = dw.select(col("doc_id").as("id1"), col("w"))
          .join(dw.select(col("doc_id").as("id2"), col("w")), "w")
          .filter(col("id1") < col("id2"))
          .groupBy("id1", "id2").agg(count(lit(1)).as("ni"))
          .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
          .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
          .filter(col("ni").cast(DoubleType) /
            (col("n1") + col("n2") - col("ni")).cast(DoubleType) >= 0.5)
          .select("id1", "id2")
          .transform(graft.ops.Pinned.pin) // joined against every config's candidates
        val nTruth = truth.agg(count(lit(1)).as("n_truth"))
        val configs = Seq((8, 2), (4, 4), (2, 8))
        // ONE minhash pass, banded three ways. The production
        // hot-bucket cap (10000) stays ON — a stop-phrase signature
        // bucket goes quadratic without it (measured +25% at the 64x
        // replica) — and the ORACLE models the same cap with a
        // HAVING-filtered bucket CTE, so the sweep measures exactly
        // the candidate set a production dedup run would generate.
        //
        // Round 18 fold: the three configs used to run THREE parallel
        // candidate pipelines (each its own bucket groupBy, pair
        // expansion, distinct and truth join — 3x the exchanges, 14
        // tiny AQE-stage scheduler barriers). All 14 band structs
        // (8+4+2) now ride ONE explode over ONE sig scan; a single
        // bucket aggregate keyed by (bands, rows_per_band, band, sig)
        // applies the same per-config cap; one pair expansion, one
        // distinct, one truth join and one groupBy(config) aggregate
        // serve all three configs — identical per-config candidate
        // sets, a third of the exchanges. The sig pin is gone with
        // the fan-out that justified it (single consumer now).
        val sig = Dedup.minhashSignatures(sample, "doc_id",
          array_distinct(split(col("text"), " ")), 16)
        val allBandStructs = configs.flatMap { case (b, r) =>
          (0 until b).map { j =>
            val parts = (j * r until (j + 1) * r).map(i => col(s"mh$i"))
            struct(lit(b).as("nb"), lit(r).as("rpb"), lit(j).as("band"),
              md5(concat(parts: _*)).as("sig"))
          }
        }
        val bandsAll = sig
          .select(col("doc_id"), explode(array(allBandStructs: _*)).as("bs"))
          .select(col("doc_id"), col("bs.nb").as("bands"),
            col("bs.rpb").as("rows_per_band"),
            col("bs.band").as("band"), col("bs.sig").as("sig"))
        val buckets = bandsAll
          .groupBy("bands", "rows_per_band", "band", "sig")
          .agg(sort_array(collect_list(col("doc_id"))).as("__ids"))
          .filter(size(col("__ids")) >= 2 && size(col("__ids")) <= 10000)
        val cand = buckets
          .select(col("bands"), col("rows_per_band"),
            posexplode(col("__ids")).as(Seq("__i", "id1")), col("__ids"))
          .select(col("bands"), col("rows_per_band"), col("id1"),
            explode(slice(col("__ids"), col("__i") + 2, size(col("__ids"))))
              .as("id2"))
          .filter(col("id1") =!= col("id2"))
          .distinct()
        val perConfig = cand
          .join(truth.withColumn("hit", lit(1L)), Seq("id1", "id2"), "left")
          .groupBy("bands", "rows_per_band")
          .agg(count(lit(1)).as("n_candidates"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        val domain = s.createDataFrame(
          s.sparkContext.parallelize(configs.map(c => org.apache.spark.sql.Row(c._1, c._2))),
          StructType(Seq(StructField("bands", IntegerType, nullable = false),
            StructField("rows_per_band", IntegerType, nullable = false))))
        domain.join(perConfig, Seq("bands", "rows_per_band"), "left")
          .crossJoin(nTruth)
          .select(col("bands"), col("rows_per_band"),
            coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_truth"))
          .withColumn("precision",
            when(col("n_candidates") > 0,
              col("n_hits").cast(DoubleType) / col("n_candidates").cast(DoubleType)))
          .withColumn("recall",
            when(col("n_truth") > 0,
              col("n_hits").cast(DoubleType) / col("n_truth").cast(DoubleType)))
          .orderBy("rows_per_band")
      },
      Some {
        val sigCols = (0 until 16).map(i =>
          s"MIN(md5('$i:' || w)) AS mh$i").mkString(",\n                  ")
        // bands for config (b, r): band j = md5(mh_{j*r} || ... || mh_{j*r+r-1})
        def bandsFor(b: Int, r: Int): String = (0 until b).map { j =>
          val parts = (j * r until (j + 1) * r).map(i => s"mh$i").mkString(" || ")
          s"SELECT doc_id, $j AS band, md5($parts) AS sig FROM sig"
        }.mkString("\n                UNION ALL ")
        def candFor(name: String, b: Int, r: Int): String =
          s"""bands_$name AS (
                ${bandsFor(b, r)}),
              ok_$name AS (
                SELECT band, sig FROM bands_$name
                GROUP BY band, sig HAVING COUNT(*) <= 10000),
              cand_$name AS (
                SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                FROM bands_$name a
                JOIN bands_$name b
                  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
                JOIN ok_$name k ON k.band = a.band AND k.sig = a.sig),
              agg_$name AS (
                SELECT $b AS bands, $r AS rows_per_band,
                       CAST(COUNT(*) AS BIGINT) AS n_candidates,
                       CAST(SUM(CASE WHEN t.id1 IS NOT NULL THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_hits
                FROM cand_$name c LEFT JOIN truth t
                  ON t.id1 = c.id1 AND t.id2 = c.id2)"""
        s"""WITH sample AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
            dw AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM sample),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM dw GROUP BY doc_id),
            truth AS (
              SELECT i.id1, i.id2 FROM
                (SELECT a.doc_id AS id1, b.doc_id AS id2,
                        CAST(COUNT(*) AS BIGINT) AS ni
                 FROM dw a JOIN dw b ON a.w = b.w AND a.doc_id < b.doc_id
                 GROUP BY 1, 2) i
                JOIN sizes sa ON sa.doc_id = i.id1
                JOIN sizes sb ON sb.doc_id = i.id2
              WHERE CAST(i.ni AS DOUBLE) /
                    CAST(sa.n + sb.n - i.ni AS DOUBLE) >= 0.5),
            n_truth AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
            sig AS (SELECT doc_id,
                  $sigCols
                FROM dw GROUP BY doc_id),
            ${candFor("a", 8, 2)},
            ${candFor("b", 4, 4)},
            ${candFor("c", 2, 8)},
            un AS (SELECT * FROM agg_a UNION ALL
                   SELECT * FROM agg_b UNION ALL
                   SELECT * FROM agg_c)
            SELECT v.bands, v.rows_per_band,
                   COALESCE(u.n_candidates, 0) AS n_candidates,
                   COALESCE(u.n_hits, 0) AS n_hits,
                   t.n_truth,
                   CASE WHEN COALESCE(u.n_candidates, 0) > 0 THEN
                     CAST(COALESCE(u.n_hits, 0) AS DOUBLE) /
                     CAST(u.n_candidates AS DOUBLE) END AS precision,
                   CASE WHEN t.n_truth > 0 THEN
                     CAST(COALESCE(u.n_hits, 0) AS DOUBLE) /
                     CAST(t.n_truth AS DOUBLE) END AS recall
            FROM (VALUES (8, 2), (4, 4), (2, 8)) AS v(bands, rows_per_band)
            LEFT JOIN un u ON u.bands = v.bands
                          AND u.rows_per_band = v.rows_per_band
            CROSS JOIN n_truth t
            ORDER BY v.rows_per_band"""
      }),

    // cross-source contamination matrix: for every pair of the ~20
    // corpus sources, how many distinct 3-word shingles they share —
    // with containment (overlap / smaller side) and Jaccard. This is
    // the dataset-governance artifact behind "did split A leak into
    // split B": q74/q88 decontaminate ONE eval set; this audits ALL
    // source pairs at once. Shape at scale: one distinct
    // (source, shingle) aggregation, then an equi-join on the shingle
    // — a shingle present in s sources expands to at most C(s,2) <=
    // C(20,2) pairs, so the join output is bounded by 190 x the
    // shingle domain, never quadratic in documents. Zero-overlap
    // pairs still emit (cross-join domain LEFT JOIN counts).
    QueryDef("q287_contamination_matrix",
      (s, d) => {
        import graft.ops.Dedup
        val srcSh = table(s, d, "documents")
          .select(col("source"), explode(
            Dedup.shingles(col("text"), 3)).as("sh"))
          .distinct()
          .transform(graft.ops.Pinned.pin) // sizes + both join sides re-read it
        val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("n"))
        val common = srcSh.select(col("source").as("src1"), col("sh"))
          .join(srcSh.select(col("source").as("src2"), col("sh")), "sh")
          .filter(col("src1") < col("src2"))
          .groupBy("src1", "src2").agg(count(lit(1)).as("n_common"))
        val domain = sizes.select(col("source").as("src1"), col("n").as("n1"))
          .crossJoin(sizes.select(col("source").as("src2"), col("n").as("n2")))
          .filter(col("src1") < col("src2"))
        domain.join(common, Seq("src1", "src2"), "left")
          .select(col("src1"), col("src2"), col("n1"), col("n2"),
            coalesce(col("n_common"), lit(0L)).as("n_common"))
          .withColumn("containment",
            col("n_common").cast(DoubleType) /
              least(col("n1"), col("n2")).cast(DoubleType))
          .withColumn("jaccard",
            col("n_common").cast(DoubleType) /
              (col("n1") + col("n2") - col("n_common")).cast(DoubleType))
          .orderBy("src1", "src2")
      },
      Some("""WITH ws AS (SELECT source, doc_id, string_split(text, ' ') AS w
                          FROM documents),
              sh AS (SELECT DISTINCT source, s FROM
                (SELECT source, array_to_string(list_slice(w, i, i + 2), ' ') AS s
                 FROM (SELECT source, w,
                         unnest(range(1, GREATEST(len(w) - 1, 2))) AS i
                       FROM ws) t1) t2),
              sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                        FROM sh GROUP BY source),
              common AS (SELECT a.source AS src1, b.source AS src2,
                                CAST(COUNT(*) AS BIGINT) AS n_common
                         FROM sh a JOIN sh b
                           ON a.s = b.s AND a.source < b.source
                         GROUP BY 1, 2),
              domain AS (SELECT a.source AS src1, a.n AS n1,
                                b.source AS src2, b.n AS n2
                         FROM sizes a JOIN sizes b ON a.source < b.source)
              SELECT d.src1, d.src2, d.n1, d.n2,
                     COALESCE(c.n_common, 0) AS n_common,
                     CAST(COALESCE(c.n_common, 0) AS DOUBLE) /
                       CAST(LEAST(d.n1, d.n2) AS DOUBLE) AS containment,
                     CAST(COALESCE(c.n_common, 0) AS DOUBLE) /
                       CAST(d.n1 + d.n2 - COALESCE(c.n_common, 0) AS DOUBLE)
                       AS jaccard
              FROM domain d LEFT JOIN common c
                ON c.src1 = d.src1 AND c.src2 = d.src2
              ORDER BY d.src1, d.src2""")),

    // distribution-drift monitor: chi-square statistic of each event
    // type's value distribution in the LATER half of the time range
    // against the EARLIER half (10 equal-width bins fitted on the
    // reference half) — the check a training pipeline runs before
    // admitting a new ingestion window, catching upstream schema/unit
    // changes as distribution shift. Everything that crosses rows is
    // an integer: cent-scaled values, integer bin ids, conditional
    // BIGINT counts pivoted to 10 columns; the chi-square is then one
    // pinned 10-term double expression per type, so the statistic is
    // bit-reproducible (no log/exp in sight — chi2, not PSI/KL, for
    // exactly that reason). One pass for the split+bin bounds, one
    // for the binned counts; both map-side-combined aggregates.
    QueryDef("q288_drift_chi2",
      (s, d) => {
        val e = table(s, d, "events").select(col("event_type"),
          col("ts").cast(TimestampType).cast(LongType).as("sec"),
          expr("CAST(floor(value * 100.0) AS BIGINT)").as("c"))
        val span = e.agg(min("sec").as("s0"), max("sec").as("s1"))
          .select(expr("(s0 + s1) div 2").as("mid"))
        val tagged = e.crossJoin(broadcast(span))
          .withColumn("is_ref", col("sec") < col("mid"))
        val bounds = tagged.filter(col("is_ref"))
          .groupBy("event_type")
          .agg(min("c").as("lo"), max("c").as("hi"))
        val binned = tagged.join(broadcast(bounds), "event_type")
          .withColumn("bin", least(lit(9L), greatest(lit(0L),
            expr("((c - lo) * 10) div (hi - lo + 1)"))))
        val binCols = (0 until 10).flatMap(b => Seq(
          sum(when(col("is_ref") && col("bin") === b, 1L).otherwise(0L))
            .as(s"r$b"),
          sum(when(!col("is_ref") && col("bin") === b, 1L).otherwise(0L))
            .as(s"c$b")))
        val pivoted = binned.groupBy("event_type")
          .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
            Seq(sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur")) ++
              binCols: _*)
        // chi2 term for bin b: (obs - exp)^2 / exp with
        // exp = r_b * n_cur / n_ref, expanded so every division is
        // explicit and the 10-term sum is left-chained (pinned order)
        val chi2 = (0 until 10).map { b =>
          val exp = col(s"r$b").cast(DoubleType) * col("n_cur").cast(DoubleType) /
            col("n_ref").cast(DoubleType)
          when(col(s"r$b") > 0,
            (col(s"c$b").cast(DoubleType) - exp) *
              (col(s"c$b").cast(DoubleType) - exp) / exp)
            .otherwise(lit(0.0))
        }.reduce(_ + _)
        pivoted
          .withColumn("chi2", chi2)
          // 9 df, alpha = 0.05 critical value
          .withColumn("drifted", col("chi2") > 16.919)
          .select("event_type", "n_ref", "n_cur", "chi2", "drifted")
          .orderBy("event_type")
      },
      Some {
        val binCountCols = (0 until 10).map(b =>
          s"""CAST(SUM(CASE WHEN is_ref AND bin = $b THEN 1 ELSE 0 END) AS BIGINT) AS r$b,
                CAST(SUM(CASE WHEN NOT is_ref AND bin = $b THEN 1 ELSE 0 END) AS BIGINT) AS c$b""")
          .mkString(",\n                ")
        val chi2Terms = (0 until 10).map(b =>
          s"""(CASE WHEN r$b > 0 THEN
                (CAST(c$b AS DOUBLE) - CAST(r$b AS DOUBLE) * CAST(n_cur AS DOUBLE) / CAST(n_ref AS DOUBLE)) *
                (CAST(c$b AS DOUBLE) - CAST(r$b AS DOUBLE) * CAST(n_cur AS DOUBLE) / CAST(n_ref AS DOUBLE)) /
                (CAST(r$b AS DOUBLE) * CAST(n_cur AS DOUBLE) / CAST(n_ref AS DOUBLE))
              ELSE 0.0 END)""").mkString(" + ")
        s"""WITH e AS (
              SELECT event_type,
                     date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
                     CAST(floor(value * 100.0) AS BIGINT) AS c
              FROM events),
            span AS (SELECT (MIN(sec) + MAX(sec)) // 2 AS mid FROM e),
            tagged AS (SELECT e.event_type, e.c, e.sec < s.mid AS is_ref
                       FROM e, span s),
            bounds AS (SELECT event_type, MIN(c) AS lo, MAX(c) AS hi
                       FROM tagged WHERE is_ref GROUP BY event_type),
            binned AS (SELECT t.event_type, t.is_ref,
                         LEAST(9, GREATEST(0, ((t.c - b.lo) * 10) // (b.hi - b.lo + 1))) AS bin
                       FROM tagged t JOIN bounds b ON b.event_type = t.event_type),
            pivoted AS (
              SELECT event_type,
                CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
                CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
                $binCountCols
              FROM binned GROUP BY event_type)
            SELECT event_type, n_ref, n_cur,
                   ($chi2Terms) AS chi2,
                   ($chi2Terms) > 16.919 AS drifted
            FROM pivoted ORDER BY event_type"""
      }),

    // embedding-space dispersion WITHOUT a pairwise join: the
    // E||x-y||^2 = 2*(E||x||^2 - ||E x||^2) identity turns the
    // quadratic "average pairwise distance" diversity metric (the
    // data-selection signal behind coverage-aware sampling) into ONE
    // corpus pass. EVERYTHING that crosses rows is a BIGINT: squared
    // norms and per-dimension values quantize per ELEMENT
    // (floor(. * 2^20) — floor on a double is exact on every engine,
    // where float->decimal casts round half-cases differently), so
    // all sums are order-free integer sums, bit-reproducible at any
    // partitioning. The per-dimension sums rescale by 2^10 before
    // squaring, which keeps the squared reduction inside int64 to
    // ~3e6 rows per label (beyond that: same plan, wider decimal
    // square). Output per class label: n, mean squared norm, squared
    // norm of the mean, and the dispersion 2*(E - M); high dispersion
    // = diverse class.
    QueryDef("q289_embedding_dispersion",
      (s, d) => {
        val e = table(s, d, "embeddings")
        // per-ELEMENT quantization (floor(x^2 * 2^20) summed as longs):
        // exact on both engines with zero dependence on float-add
        // association — a whole-norm quantize would sit one ULP from a
        // floor boundary whenever accumulators associate differently
        val rowNorm = e.select(col("label"),
          expr("""aggregate(embedding, CAST(0 AS BIGINT), (acc, x) ->
                  acc + CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                  * 1048576.0) AS BIGINT))""").as("nq"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum("nq").as("snq"))
        val dimSums = e
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .select(col("label"), col("pos"), expr(
            "CAST(floor(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)").as("vq"))
          .groupBy("label", "pos")
          .agg(sum(col("vq")).as("sv"))
          // rescale by 2^10 BEFORE squaring (floor through an exact
          // power-of-two double division — `div` would differ between
          // engines on negative sums: truncation vs floor) so the
          // squared sum stays inside int64 to ~3e6 rows per label
          .withColumn("svq", expr("CAST(floor(CAST(sv AS DOUBLE) / 1024.0) AS BIGINT)"))
          .groupBy("label")
          .agg(sum(col("svq") * col("svq")).as("ssq"))
        rowNorm.join(dimSums, "label")
          .withColumn("e_norm2",
            col("snq").cast(DoubleType) /
              (col("n").cast(DoubleType) * 1048576.0))
          .withColumn("m_norm2",
            col("ssq").cast(DoubleType) /
              (col("n").cast(DoubleType) * col("n").cast(DoubleType) * 1048576.0))
          .withColumn("dispersion",
            lit(2.0) * (col("e_norm2") - col("m_norm2")))
          .select("label", "n", "e_norm2", "m_norm2", "dispersion")
          .orderBy("label")
      },
      Some("""WITH rn AS (
                SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(list_sum(list_transform(embedding,
                         x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              * 1048576.0) AS BIGINT)))) AS BIGINT) AS snq
                FROM embeddings GROUP BY label),
              dim AS (
                SELECT label, pos,
                       CAST(floor(CAST(CAST(SUM(vq) AS BIGINT) AS DOUBLE) / 1024.0)
                            AS BIGINT) AS svq
                FROM (SELECT label,
                        CAST(floor(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT) AS vq,
                        pos
                      FROM (SELECT label,
                              unnest(embedding) AS v,
                              generate_subscripts(embedding, 1) AS pos
                            FROM embeddings))
                GROUP BY label, pos),
              ssqs AS (SELECT label, CAST(SUM(svq * svq) AS BIGINT) AS ssq
                       FROM dim GROUP BY label)
              SELECT r.label, r.n,
                     CAST(r.snq AS DOUBLE) / (CAST(r.n AS DOUBLE) * 1048576.0) AS e_norm2,
                     CAST(s.ssq AS DOUBLE) /
                       (CAST(r.n AS DOUBLE) * CAST(r.n AS DOUBLE) * 1048576.0) AS m_norm2,
                     2.0 * (CAST(r.snq AS DOUBLE) / (CAST(r.n AS DOUBLE) * 1048576.0) -
                            CAST(s.ssq AS DOUBLE) /
                              (CAST(r.n AS DOUBLE) * CAST(r.n AS DOUBLE) * 1048576.0))
                       AS dispersion
              FROM rn r JOIN ssqs s ON s.label = r.label
              ORDER BY r.label""")),

    // protocol / table-features lifecycle under the oracle gate: a
    // table declares its protocol, then every feature-using commit
    // (deletion-vector delete, column rename, CHECK constraint)
    // auto-extends the declared reader/writer feature lists in the
    // SAME commit — so a declared protocol can never under-state what
    // a future reader needs (the format-evolution contract tables at
    // 100 TB live or die by: an engine that lacks a feature fails
    // loudly up front instead of silently mis-reading DV-masked
    // rows). The oracle pins the exact expected feature strings at
    // every step AND recomputes the table contents from `customer`,
    // proving the gating never perturbs data. Refusal behavior
    // (unknown features block reads/writes) is ProtocolSpec's.
    QueryDef("q290_protocol_lifecycle",
      (s, d) => {
        import graft.sink.TxLogTable
        val t = QueryDef.scratch("graft_proto")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        TxLogTable.append(base, t)
        def step(n: Int): org.apache.spark.sql.DataFrame = {
          val (r, w) = TxLogTable.protocol(s, t)
          TxLogTable.read(s, t).agg(
            lit(n).as("step"),
            lit(r.toSeq.sorted.mkString(",")).as("reader_features"),
            lit(w.toSeq.sorted.mkString(",")).as("writer_features"),
            count(lit(1)).as("n_rows"), sum(col("bal_c")).as("bal_cents"))
        }
        val s1 = step(1)
        TxLogTable.upgradeProtocol(s, t,
          writerFeatures = Set("checkConstraints"))
        val s2 = step(2)
        TxLogTable.deleteVectors(s, t, "k % 10 = 0")
        val s3 = step(3)
        TxLogTable.renameColumn(s, t, "seg", "segment")
        val s4 = step(4)
        TxLogTable.addConstraint(s, t, "k_pos", "k > 0")
        val s5 = step(5)
        s1.unionAll(s2).unionAll(s3).unionAll(s4).unionAll(s5)
          .orderBy("step")
      },
      Some("""WITH b AS (
                SELECT c_custkey AS k,
                       CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c
                FROM customer),
              full_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                                CAST(SUM(bal_c) AS BIGINT) AS s FROM b),
              masked AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                                CAST(SUM(bal_c) AS BIGINT) AS s
                         FROM b WHERE k % 10 <> 0)
              SELECT 1 AS step, '' AS reader_features, '' AS writer_features,
                     f.n AS n_rows, f.s AS bal_cents FROM full_t f
              UNION ALL
              SELECT 2, '', 'checkConstraints', f.n, f.s FROM full_t f
              UNION ALL
              SELECT 3, 'deletionVectors', 'checkConstraints,deletionVectors',
                     m.n, m.s FROM masked m
              UNION ALL
              SELECT 4, 'columnMapping,deletionVectors',
                     'checkConstraints,columnMapping,deletionVectors',
                     m.n, m.s FROM masked m
              UNION ALL
              SELECT 5, 'checkConstraints,columnMapping,deletionVectors',
                     'checkConstraints,columnMapping,deletionVectors',
                     m.n, m.s FROM masked m
              ORDER BY step""")),

    // n-gram novelty scoring (data-valuation / memorization-risk
    // signal): per document, what fraction of its distinct 3-gram
    // shingles appear in NO other document — highly-novel documents
    // carry unique information worth keeping; zero-novelty documents
    // are recombinations of boilerplate. One distinct
    // (shingle -> df) aggregate over the corpus (map-side combined)
    // joined back to each doc's shingles; per-source summary so the
    // output stays bounded at any corpus size. The novelty join is
    // the same inverted-index shape as q58/q87 — shuffle by shingle
    // hash, never all-pairs.
    QueryDef("q291_ngram_novelty",
      (s, d) => {
        import graft.ops.Dedup
        val docSh = table(s, d, "documents")
          .select(col("doc_id"), col("source"),
            explode(Dedup.shingles(col("text"), 3)).as("sh"))
          .distinct()
          .transform(graft.ops.Pinned.pin) // df aggregate + novelty join both read it
        val df_ = docSh.groupBy("sh").agg(count(lit(1)).as("df"))
        val perDoc = docSh.join(df_, "sh")
          .groupBy("doc_id", "source")
          .agg(count(lit(1)).as("n_sh"),
            sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_sh").as("shingles"),
            sum("n_unique").as("unique_shingles"),
            sum(when(col("n_unique") * 2L >= col("n_sh"), 1L)
              .otherwise(0L)).as("mostly_novel_docs"))
          .withColumn("novelty",
            col("unique_shingles").cast(DoubleType) /
              col("shingles").cast(DoubleType))
          .orderBy("source")
      },
      Some("""WITH ws AS (SELECT doc_id, source, string_split(text, ' ') AS w
                          FROM documents),
              sh AS (SELECT DISTINCT doc_id, source, s FROM
                (SELECT doc_id, source,
                        array_to_string(list_slice(w, i, i + 2), ' ') AS s
                 FROM (SELECT doc_id, source, w,
                         unnest(range(1, GREATEST(len(w) - 1, 2))) AS i
                       FROM ws) t1) t2),
              dfreq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df
                        FROM sh GROUP BY s),
              per_doc AS (
                SELECT sh.doc_id, sh.source,
                       CAST(COUNT(*) AS BIGINT) AS n_sh,
                       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_unique
                FROM sh JOIN dfreq d ON d.s = sh.s
                GROUP BY sh.doc_id, sh.source)
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(n_sh) AS BIGINT) AS shingles,
                     CAST(SUM(n_unique) AS BIGINT) AS unique_shingles,
                     CAST(SUM(CASE WHEN n_unique * 2 >= n_sh THEN 1 ELSE 0 END)
                          AS BIGINT) AS mostly_novel_docs,
                     CAST(SUM(n_unique) AS DOUBLE) / CAST(SUM(n_sh) AS DOUBLE)
                       AS novelty
              FROM per_doc GROUP BY source ORDER BY source""")),

    // duplication exposure curve: if the corpus were trained on
    // as-is, how many tokens would the model see once, 2-3 times,
    // 4+ times? Exact-duplicate groups (md5 of normalized text — the
    // q33 fingerprint) weighted by token counts, bucketed by copy
    // count. This is the table that justifies a dedup stage's token
    // budget: the "4+" row IS the wasted/memorization-prone
    // exposure. One fingerprint aggregate + one bounded bucket
    // rollup; the curve has 3 rows at any corpus size.
    QueryDef("q292_dup_exposure",
      (s, d) => {
        val groups = table(s, d, "documents")
          .select(md5(lower(regexp_replace(col("text"), "\\s+", " ")))
            .as("fp"),
            graft.ops.TextStats.tokenCount(col("text")).as("tok"))
          .groupBy("fp")
          .agg(count(lit(1)).as("copies"), sum("tok").as("toks"))
        val bucketed = groups.withColumn("bucket",
          when(col("copies") === 1L, "1_unique")
            .when(col("copies") <= 3L, "2_light_dup")
            .otherwise("3_heavy_dup"))
        val curve = bucketed.groupBy("bucket")
          .agg(count(lit(1)).as("n_groups"),
            sum("copies").as("n_docs"),
            sum("toks").as("token_exposure"))
        // fixed bucket domain: an all-unique corpus still emits all
        // three curve rows (zeros), the q270-family eval pattern
        val domain = s.createDataFrame(
          s.sparkContext.parallelize(Seq("1_unique", "2_light_dup",
            "3_heavy_dup").map(org.apache.spark.sql.Row(_))),
          StructType(Seq(StructField("bucket", StringType, nullable = false))))
        domain.join(curve, Seq("bucket"), "left")
          .select(col("bucket"),
            coalesce(col("n_groups"), lit(0L)).as("n_groups"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"),
            coalesce(col("token_exposure"), lit(0L)).as("token_exposure"))
          .orderBy("bucket")
      },
      Some("""WITH g AS (
                SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
                       CAST(COUNT(*) AS BIGINT) AS copies,
                       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
                FROM documents GROUP BY 1),
              b AS (SELECT CASE WHEN copies = 1 THEN '1_unique'
                                WHEN copies <= 3 THEN '2_light_dup'
                                ELSE '3_heavy_dup' END AS bucket,
                           copies, toks
                    FROM g),
              curve AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_groups,
                               CAST(SUM(copies) AS BIGINT) AS n_docs,
                               CAST(SUM(toks) AS BIGINT) AS token_exposure
                        FROM b GROUP BY bucket)
              SELECT d.bucket, COALESCE(c.n_groups, 0) AS n_groups,
                     COALESCE(c.n_docs, 0) AS n_docs,
                     COALESCE(c.token_exposure, 0) AS token_exposure
              FROM (VALUES ('1_unique'), ('2_light_dup'), ('3_heavy_dup'))
                AS d(bucket)
              LEFT JOIN curve c ON c.bucket = d.bucket
              ORDER BY d.bucket""")),

    // log-retention lifecycle under the oracle gate: 12 single-batch
    // appends (the auto-checkpoint folds at 10), expireLog reclaims
    // commits 1–9 plus any superseded checkpoints, and the table
    // keeps serving — latest reads, travel to the checkpoint version
    // and to tail versions, and commit-metadata fastCount all resolve
    // from checkpoint + tail alone. The oracle recomputes every
    // count/sum from `nation` and pins the exact post-expiry version
    // census. Exception behavior (travel below the horizon, gapped
    // change feeds) is RetentionSpec's.
    QueryDef("q293_retention_lifecycle",
      (s, d) => {
        import graft.sink.TxLogTable
        val t = QueryDef.scratch("graft_retain")
          .resolve("nat").toString
        val base = table(s, d, "nation").select(
          col("n_nationkey").cast(LongType).as("k"),
          col("n_regionkey").cast(LongType).as("r"))
          .orderBy("k").limit(12).transform(graft.ops.Pinned.pin)
        val rows12 = base.collect().sortBy(_.getLong(0))
        rows12.foreach { row =>
          TxLogTable.append(
            s.createDataFrame(java.util.Arrays.asList(row), base.schema), t)
        }
        val expired = TxLogTable.expireLog(s, t, olderThanMillis = 0L)
        val versions = TxLogTable.history(s, t)
          .select("version").orderBy("version")
          .collect().map(_.getLong(0))
        def agg(n: Int, asOf: Option[Long]) =
          TxLogTable.read(s, t, asOf).agg(
            lit(n).as("step"),
            lit(expired.toLong).as("n_expired"),
            lit(versions.min).as("min_version"),
            lit(versions.max).as("max_version"),
            count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
        agg(1, None).unionAll(agg(2, Some(10L))).unionAll(agg(3, Some(11L)))
          .orderBy("step")
      },
      Some("""WITH b AS (
                SELECT n_nationkey AS k FROM nation ORDER BY k LIMIT 12),
              pick AS (SELECT k, ROW_NUMBER() OVER (ORDER BY k) AS i FROM b)
              SELECT 1 AS step, CAST(9 AS BIGINT) AS n_expired,
                     CAST(10 AS BIGINT) AS min_version,
                     CAST(12 AS BIGINT) AS max_version,
                     CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(SUM(k) AS BIGINT) AS k_sum
              FROM pick
              UNION ALL
              SELECT 2, 9, 10, 12, COUNT(*), CAST(SUM(k) AS BIGINT)
              FROM pick WHERE i <= 10
              UNION ALL
              SELECT 3, 9, 10, 12, COUNT(*), CAST(SUM(k) AS BIGINT)
              FROM pick WHERE i <= 11
              ORDER BY step""")))
}
