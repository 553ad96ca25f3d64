package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Corpus
import QueryDef.table

/** Round-4 widening, batch 9: MATCH_RECOGNIZE-style sequence pattern
  * counting, an end-to-end entity-resolution composite, the
  * multimodal frame-sampling plan, and embedding QA/eval passes.
  *
  * Determinism: event sequences serialize in (ts, event_id) order and
  * the patterns are LITERAL strings (no quantifiers — Java regex vs
  * RE2 ambiguity never enters; non-overlapping leftmost scan is
  * identical); entity resolution is the SymSpell candidate join +
  * min-label propagation, all string/integer algebra; frame indexes
  * and purity are pure integers; the dim profile uses selections and
  * the decimal mean accumulator.
  */
object Extras12 {

  val all: Seq[QueryDef] = Seq(

    // sequence pattern counting (MATCH_RECOGNIZE-lite): serialize each
    // user's view/click/purchase stream into a letter string in time
    // order, then count literal patterns — strict V→C→P conversions
    // and direct V→P impulse buys. One shuffle keys everything by
    // user; per-user strings are bounded by the user's event count,
    // and the pattern scan is a codegen'd regexp over that string.
    QueryDef("q179_seq_pattern",
      (s, d) => {
        val e = table(s, d, "events")
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type") === "view", "V")
              .when(col("event_type") === "click", "C")
              .otherwise("P").as("letter"))
        e.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            array_join(
              transform(sort_array(collect_list(struct(
                col("ts").as("ts"), col("event_id").as("eid"),
                col("letter").as("l")))),
                x => x.getField("l")), "").as("seq"))
          .withColumn("n_vcp", regexp_count(col("seq"), lit("VCP")))
          .withColumn("n_vp", regexp_count(col("seq"), lit("VP")))
          .select(col("user_id"), col("n_events"),
            col("n_vcp").cast(LongType).as("n_vcp"),
            col("n_vp").cast(LongType).as("n_vp"))
          .filter(col("n_vcp") > 0 || col("n_vp") > 0)
          .orderBy("user_id")
      },
      Some("""WITH e AS (
                SELECT user_id, ts, event_id,
                  CASE event_type WHEN 'view' THEN 'V'
                    WHEN 'click' THEN 'C' ELSE 'P' END AS letter
                FROM events WHERE event_type IN ('view', 'click', 'purchase')),
              seqs AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                  string_agg(letter, '' ORDER BY ts, event_id) AS seq
                FROM e GROUP BY user_id),
              counted AS (
                SELECT user_id, n_events,
                  CAST(len(regexp_extract_all(seq, 'VCP')) AS BIGINT) AS n_vcp,
                  CAST(len(regexp_extract_all(seq, 'VP')) AS BIGINT) AS n_vp
                FROM seqs)
              SELECT user_id, n_events, n_vcp, n_vp
              FROM counted WHERE n_vcp > 0 OR n_vp > 0
              ORDER BY user_id""")),

    // entity resolution end-to-end: SymSpell deletion-neighborhood
    // blocking (q161) generates candidate name pairs, a residual
    // levenshtein confirms them as match edges, min-label propagation
    // (Corpus.duplicateClusters — the q77 machinery) finds the
    // transitive match components, and every name maps to its
    // canonical (lexicographic-min) form. The full dedupe-to-golden-
    // record pipeline as ONE composed Catalyst DAG; names absent from
    // any pair stay their own canonical.
    QueryDef("q180_entity_resolution",
      (s, d) => {
        val names = table(s, d, "part").select(col("p_name")).distinct()
          .transform(graft.ops.Pinned.pin) // feeds variant build AND the final mapping
        val vars = names.select(col("p_name"), explode(expr(
          """array_append(
               transform(sequence(1, length(p_name)),
                 i -> concat(substr(p_name, 1, i - 1), substr(p_name, i + 1))),
               p_name)""")).as("v"))
        val pairs = vars.select(col("p_name").as("id1"), col("v"))
          .join(vars.select(col("p_name").as("id2"), col("v")), Seq("v"))
          .filter(col("id1") < col("id2"))
          .select("id1", "id2").distinct()
          .filter(expr("levenshtein(id1, id2) <= 1"))
        val clusters = Corpus.duplicateClusters(pairs)
        val mapped = names
          .join(clusters.withColumnRenamed("id", "p_name"), Seq("p_name"), "left")
          .select(col("p_name").as("name"),
            coalesce(col("cluster"), col("p_name")).as("canonical"))
        val sizes = mapped.groupBy("canonical").agg(count(lit(1)).as("n_members"))
        mapped.join(sizes, "canonical")
          .select("name", "canonical", "n_members")
          .orderBy("canonical", "name")
      },
      Some("""WITH RECURSIVE
              n AS (SELECT DISTINCT p_name FROM part),
              p AS (
                SELECT a.p_name AS id1, b.p_name AS id2
                FROM n a, n b
                WHERE a.p_name < b.p_name
                  AND levenshtein(a.p_name, b.p_name) <= 1),
              e AS (SELECT id1 AS src, id2 AS dst FROM p
                    UNION ALL SELECT id2, id1 FROM p),
              walk(id, label) AS (
                SELECT src, src FROM e
                UNION
                SELECT e.dst, walk.label FROM walk JOIN e ON e.src = walk.id),
              labels AS (SELECT id, MIN(label) AS cluster FROM walk GROUP BY id),
              mapped AS (
                SELECT n.p_name AS name,
                  COALESCE(l.cluster, n.p_name) AS canonical
                FROM n LEFT JOIN labels l ON l.id = n.p_name),
              sizes AS (SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_members
                        FROM mapped GROUP BY canonical)
              SELECT m.name, m.canonical, s.n_members
              FROM mapped m JOIN sizes s ON s.canonical = m.canonical
              ORDER BY m.canonical, m.name""")),

    // video frame-sampling plan: every 4th frame index per media item,
    // derived from the q45 decode geometry — the Spark-side plumbing
    // (schema, per-item generator, batch shape) a real frame extractor
    // plugs into. Map-only: `sequence` builds the index list per row,
    // no shuffle before the output sort.
    QueryDef("q181_frame_sample",
      (s, d) => {
        val media = table(s, d, "documents").select(
          col("doc_id").as("media_id"),
          col("text").cast(BinaryType).as("content"),
          lit("application/octet-stream").as("mime"))
        graft.ops.Multimodal.decodeFeatures(media).toDF()
          .select(col("media_id"), col("n_frames"))
          .withColumn("frames",
            graft.ops.Multimodal.sampleFrameIndexes(col("n_frames"), 4))
          .select(col("media_id"), col("n_frames").cast(LongType).as("n_frames"),
            size(col("frames")).cast(LongType).as("n_sampled"),
            array_join(transform(col("frames"), _.cast(StringType)), ",")
              .as("frame_idxs"))
          .orderBy("media_id")
      },
      Some("""WITH meta AS (
                SELECT doc_id AS media_id,
                  1 + ascii(substr(text, 1 + (2 % GREATEST(strlen(text), 1)), 1)) % 32
                    AS n_frames
                FROM documents)
              SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
                CAST(len(range(0, n_frames, 4)) AS BIGINT) AS n_sampled,
                array_to_string(range(0, n_frames, 4), ',') AS frame_idxs
              FROM meta ORDER BY media_id""")),

    // per-dimension embedding profile: n/min/max/mean/range for every
    // dimension of the corpus — the embedding-QA pass that catches
    // dead dimensions (range ~ 0) and scale outliers before an ANN
    // index is built. posexplode fans the vectors out once; stats
    // collapse to |dims| rows (64) in one keyed aggregation with
    // map-side combine; min/max are pure selections, the mean is the
    // repo's decimal accumulator.
    QueryDef("q182_embedding_dim_profile",
      (s, d) => {
        table(s, d, "embeddings")
          .select(posexplode(col("embedding").cast("array<double>")).as(Seq("p", "x")))
          .select((col("p") + 1).as("dim"), col("x"))
          .groupBy("dim")
          .agg(count(lit(1)).as("n"),
            min("x").as("mn"), max("x").as("mx"),
            (sum(col("x").cast(DecimalType(30, 8))).cast(DoubleType) /
              count(lit(1)).cast(DoubleType)).as("mean"))
          .withColumn("rng", col("mx") - col("mn"))
          .orderBy("dim")
      },
      Some("""WITH e AS (
                SELECT generate_subscripts(embedding, 1) AS dim,
                  CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings)
              SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
                MIN(x) AS mn, MAX(x) AS mx,
                CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS mean,
                MAX(x) - MIN(x) AS rng
              FROM e GROUP BY dim ORDER BY dim""")),

    // clustering-vs-label agreement: assign every vector to its
    // nearest seed centroid (the q142 argmin kernel), cross-tabulate
    // against the ground-truth label column, and score per-cluster
    // PURITY in integer basis points — the unsupervised-quality eval
    // an embedding pipeline runs after every re-train. Counts are
    // exact integers; the majority label ties break lexically.
    QueryDef("q183_cluster_purity",
      (s, d) => {
        val emb = table(s, d, "embeddings")
        val asD = (c: org.apache.spark.sql.Column) =>
          transform(c, x => x.cast(DoubleType))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), asD(col("embedding")).as("cv"))
        val assign = emb
          .select(col("vec_id"), asD(col("embedding")).as("vv"))
          .crossJoin(broadcast(cents))
          .select(col("vec_id"), col("cid"),
            sqrt(aggregate(zip_with(col("vv"), col("cv"), (x, y) => (x - y) * (x - y)),
              lit(0.0), (acc, x) => acc + x)).as("dist"))
          .groupBy("vec_id")
          .agg(min(struct(col("dist"), col("cid"))).as("m"))
          .select(col("vec_id"), col("m.cid").as("cid"))
        val cells = assign.join(emb.select(col("vec_id"), col("label")), "vec_id")
          .groupBy("cid", "label").agg(count(lit(1)).as("c"))
        cells.groupBy("cid")
          .agg(sum("c").as("n_members"),
            min(struct((-col("c")).as("negc"), col("label").as("label"))).as("top"))
          .select(col("cid"), col("n_members"),
            col("top.label").as("majority_label"),
            (-col("top.negc")).as("majority_n"),
            expr("(-top.negc) * 10000 div n_members").as("purity_bp"))
          .orderBy("cid")
      },
      Some("""WITH c AS (SELECT vec_id AS cid,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
                FROM embeddings WHERE vec_id < 8),
              v AS (SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
                FROM embeddings),
              d AS (SELECT v.vec_id, v.label, c.cid,
                  row_number() OVER (PARTITION BY v.vec_id
                    ORDER BY list_distance(v.vv, c.cv), c.cid) AS rn
                FROM v CROSS JOIN c),
              a AS (SELECT vec_id, label, cid FROM d WHERE rn = 1),
              cells AS (
                SELECT cid, label, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM a GROUP BY cid, label),
              top AS (
                SELECT cid, CAST(SUM(cnt) AS BIGINT) AS n_members,
                  MIN({'negc': -cnt, 'label': label}) AS t
                FROM cells GROUP BY cid)
              SELECT cid, n_members,
                t['label'] AS majority_label,
                CAST(-t['negc'] AS BIGINT) AS majority_n,
                CAST(-t['negc'] AS BIGINT) * 10000 // n_members AS purity_bp
              FROM top ORDER BY cid""")))
}
