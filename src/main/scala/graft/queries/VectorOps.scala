package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Multimodal, Similarity}
import QueryDef.table

/** Similarity search + multimodal suite over `embeddings` (and binary
  * payloads synthesized from `documents` — the testdata carries no real
  * media bytes).
  */
object VectorOps {

  /** Oracle fragment: sign-LSH bucket key (DuckDB). */
  private def bucketSql(bits: Int): String =
    (1 to bits).map(i => s"(CASE WHEN embedding[$i] > 0 THEN '1' ELSE '0' END)").mkString(" || ")

  val all: Seq[QueryDef] = Seq(

    // brute-force cosine top-k — the ANN correctness baseline
    QueryDef("q40_embed_topk",
      (s, d) => Similarity.bruteForceTopK(table(s, d, "embeddings"), queryVecId = 0L, k = 10),
      Some("""SELECT b.vec_id,
                list_cosine_similarity(
                  list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
                  (SELECT list_transform(a.embedding, x -> CAST(x AS DOUBLE))
                   FROM embeddings a WHERE a.vec_id = 0)) AS cos
              FROM embeddings b WHERE b.vec_id <> 0
              ORDER BY cos DESC, vec_id LIMIT 10""")),

    // embedding-cosine near-duplicate pairs, id-range blocked equi-join
    QueryDef("q41_embed_neardup",
      (s, d) => Similarity.nearDupPairsBlocked(table(s, d, "embeddings"),
          threshold = 0.3, blockSize = 100L)
        .orderBy("id1", "id2"),
      Some("""SELECT * FROM (
                SELECT a.vec_id AS id1, b.vec_id AS id2,
                  list_cosine_similarity(
                    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                    list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS cos
                FROM embeddings a JOIN embeddings b
                  ON CAST(FLOOR(a.vec_id / 100) AS BIGINT) = CAST(FLOOR(b.vec_id / 100) AS BIGINT)
                 AND a.vec_id < b.vec_id) t
              WHERE cos >= 0.3 ORDER BY id1, id2""")),

    // near-dup pairs blocked by the sign-LSH bucket — q41's documented
    // scale path made concrete: the blocking key derives from the
    // vector, so the equi-join only compares plausibly-similar
    // candidates (~1/2^bits of the pair space); boundary pairs are the
    // recall tradeoff, recovered by fewer bits or multi-probe.
    // `bits` is count-DERIVED (the q283 sizing contract: ceil-log2 of
    // corpus/64, pure-integer digit count) so buckets stay ~64
    // vectors and the pair expansion stays linear — the 64× sweep
    // measured 15.5 s / 43× with pinned bits=4.
    QueryDef("q128_lsh_neardup_pairs",
      (s, d) => {
        val emb = table(s, d, "embeddings")
        // shared sizing contract (Similarity.derivedBits — the one
        // definition, mirrored by derivedBitsSql in the oracle)
        val bits = Similarity.derivedBits(emb.count())
        Similarity.nearDupPairsLsh(emb, threshold = 0.3, bits = bits)
          .orderBy("id1", "id2")
      },
      Some(s"""WITH p AS (${Similarity.derivedBitsSql("embeddings")}),
               eb AS (SELECT vec_id, embedding,
                    substr(${bucketSql(16)}, 1, (SELECT bits FROM p)) AS bucket
                  FROM embeddings)
              SELECT * FROM (
                SELECT a.vec_id AS id1, b.vec_id AS id2,
                  list_cosine_similarity(
                    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                    list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS cos
                FROM eb a JOIN eb b
                  ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t
              WHERE cos >= 0.3 ORDER BY id1, id2""")),

    // deterministic sign-LSH bucket histogram (the IVF coarse quantizer)
    QueryDef("q42_lsh_buckets",
      (s, d) => table(s, d, "embeddings")
        .groupBy(Similarity.signBucket(col("embedding"), 8).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some(s"""SELECT ${bucketSql(8)} AS bucket, COUNT(*) AS n
              FROM embeddings GROUP BY 1 ORDER BY bucket""")),

    // ANN probe: search only the query vector's bucket (the scale path)
    QueryDef("q43_ann_bucket",
      (s, d) => Similarity.annTopKInBucket(table(s, d, "embeddings"),
        queryVecId = 0L, k = 5, bits = 4),
      Some(s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql(4)} AS bucket FROM embeddings)
              SELECT x.vec_id,
                list_cosine_similarity(
                  list_transform(x.embedding, v -> CAST(v AS DOUBLE)), q.emb) AS cos
              FROM b x JOIN
                (SELECT bucket, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
                 FROM b WHERE vec_id = 0) q
                ON x.bucket = q.bucket
              WHERE x.vec_id <> 0
              ORDER BY cos DESC, vec_id LIMIT 5""")),

    // multi-probe ANN: query bucket + all Hamming-distance-1 buckets
    // (one flipped sign bit). Probes 5/16 of the corpus at bits=4 —
    // the recall/scan-cost middle ground between q43's single probe
    // and q40's exhaustive scan.
    QueryDef("q118_ann_multiprobe",
      (s, d) => Similarity.annTopKMultiProbe(table(s, d, "embeddings"),
        queryVecId = 0L, k = 5, bits = 4),
      Some(s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql(4)} AS bucket FROM embeddings),
              q AS (SELECT bucket, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
                    FROM b WHERE vec_id = 0),
              probes AS (
                SELECT bucket, emb FROM q
                UNION ALL
                SELECT substr(bucket, 1, CAST(i - 1 AS INT)) ||
                       (CASE substr(bucket, CAST(i AS INT), 1) WHEN '1' THEN '0' ELSE '1' END) ||
                       substr(bucket, CAST(i + 1 AS INT)) AS bucket, emb
                FROM (SELECT bucket, emb, unnest(range(1, 5)) AS i FROM q) f)
              SELECT x.vec_id,
                list_cosine_similarity(
                  list_transform(x.embedding, v -> CAST(v AS DOUBLE)), p.emb) AS cos
              FROM b x JOIN probes p ON x.bucket = p.bucket
              WHERE x.vec_id <> 0
              ORDER BY cos DESC, vec_id LIMIT 5""")),

    // multimodal metadata pass over binary payloads (scan-speed, no decode)
    QueryDef("q44_multimodal_meta",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          Multimodal.byteLength(col("text").cast(BinaryType)).as("n_bytes"),
          md5(col("text")).as("content_md5"),
          lower(hex(substring(col("text"), 1, 4).cast(BinaryType))).as("magic"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS content_md5,
                lower(hex(encode(substring(text, 1, 4)))) AS magic
              FROM documents ORDER BY doc_id""")),

    // IVF-style ANN (the other scale path, complementing sign-LSH q43):
    // label-mean centroids are the coarse quantizer; every vector is
    // assigned to its nearest centroid (map-side: the centroid table is
    // tiny and broadcast), and a query probes only the top-nprobe
    // centroid lists — at corpus scale the inverted lists are
    // hash-partitioned by centroid so a probe touches nprobe/k of the
    // data. Centroid means use decimal sums (order-independent →
    // engine-identical doubles); ranking compares RAW doubles (both
    // engines fold dims left-to-right), emitted raw — no round().
    QueryDef("q80_ivf_ann",
      (s, d) => {
        import graft.functions.VectorExprs.cosineSim
        val emb = table(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
        val centroids = emb
          .select(col("label"), posexplode(col("v")).as(Seq("p", "x")))
          .groupBy("label", "p")
          .agg((sum(col("x").cast(DecimalType(30, 8))).cast(DoubleType) /
            count(lit(1))).as("m"))
          .groupBy("label")
          .agg(sort_array(collect_list(struct(col("p"), col("m"))))
            .getField("m").as("cv"))
          .select(col("label").as("c_label"), col("cv"))
        val scored = emb.crossJoin(broadcast(centroids))
          .select(col("vec_id"), col("v"), col("c_label"),
            cosineSim(col("v"), col("cv")).as("cc"))
        val byCos = Window.partitionBy("vec_id")
          .orderBy(col("cc").desc, col("c_label"))
        val assigned = scored
          .withColumn("rn", row_number().over(byCos)).filter(col("rn") === 1)
          .select(col("vec_id"), col("v"), col("c_label").as("list_label"))
        val probes = scored.filter(col("vec_id") === 0)
          .withColumn("rn", row_number().over(byCos)).filter(col("rn") <= 2)
          .select(col("c_label").as("probe_label"))
        val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
        assigned.filter(col("vec_id") =!= 0)
          .join(broadcast(probes), col("list_label") === col("probe_label"))
          .crossJoin(broadcast(qv))
          .select(col("vec_id"), cosineSim(col("v"), col("qv")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id").asc)
          .limit(5)
      },
      Some("""WITH e AS (
                SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings),
              dims AS (
                SELECT label, i,
                  CAST(SUM(CAST(v[i + 1] AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*) AS m
                FROM (SELECT label, v, unnest(range(len(v))) AS i FROM e) t
                GROUP BY label, i),
              cent AS (SELECT label AS c_label, list(m ORDER BY i) AS cv
                       FROM dims GROUP BY label),
              scored AS (
                SELECT e.vec_id, e.v, c.c_label,
                  list_cosine_similarity(e.v, c.cv) AS cc
                FROM e CROSS JOIN cent c),
              assigned AS (
                SELECT vec_id, v, c_label AS list_label FROM
                  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY cc DESC, c_label) AS rn FROM scored) t
                WHERE rn = 1),
              probes AS (
                SELECT c_label AS probe_label FROM
                  (SELECT c_label, ROW_NUMBER() OVER (ORDER BY cc DESC, c_label) AS rn
                   FROM scored WHERE vec_id = 0) t
                WHERE rn <= 2),
              qv AS (SELECT v AS qv FROM e WHERE vec_id = 0)
              SELECT a.vec_id, list_cosine_similarity(a.v, q.qv) AS cos
              FROM assigned a JOIN probes p ON a.list_label = p.probe_label
                CROSS JOIN qv q
              WHERE a.vec_id <> 0
              ORDER BY cos DESC, a.vec_id LIMIT 5""")),

    // stubbed decode/feature-extract pass (mapPartitions). The stub
    // derives geometry from the leading bytes, so the oracle can
    // replicate it exactly over the ASCII test corpus
    // (byte i == ascii(char i+1); the SQL mirrors the stub's
    // index wraparound so sub-3-char texts agree too) — the
    // handwritten per-partition code is hash-verified like any
    // declarative query.
    QueryDef("q45_media_decode",
      (s, d) => {
        val media = table(s, d, "documents").select(
          col("doc_id").as("media_id"),
          col("text").cast(BinaryType).as("content"),
          lit("application/octet-stream").as("mime"))
        Multimodal.decodeFeatures(media)
          .toDF()
          .select("media_id", "n_bytes", "mime", "width", "height", "n_frames")
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
                CAST(strlen(text) AS BIGINT) AS n_bytes,
                'application/octet-stream' AS mime,
                1 + ascii(substr(text, 1, 1)) % 512 AS width,
                1 + ascii(substr(text, 1 + (1 % GREATEST(strlen(text), 1)), 1)) % 512 AS height,
                1 + ascii(substr(text, 1 + (2 % GREATEST(strlen(text), 1)), 1)) % 32 AS n_frames
              FROM documents ORDER BY media_id""")),

    // int8 scalar quantization of the embedding column: per-dimension
    // global [min,max] → 0..255 codes — the 4× memory shrink that lets
    // an ANN index hold 4× the vectors per executor. min/max are pure
    // selections (no FP arithmetic) and the code formula is one IEEE
    // expression, so codes are bit-identical cross-engine. Stats side
    // is |dims| rows → broadcast; codes are computed map-side.
    QueryDef("q96_quantize_embeddings",
      (s, d) => {
        val ex = table(s, d, "embeddings")
          .select(col("vec_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("p", "x")))
        val stats = ex.groupBy("p")
          .agg(min("x").as("lo"), max("x").as("hi"))
        ex.join(broadcast(stats), "p")
          .select(col("vec_id"), col("p"),
            when(col("hi") === col("lo"), lit(0L))
              .otherwise(floor((col("x") - col("lo")) * 255.0 / (col("hi") - col("lo")))
                .cast(LongType)).as("code"))
          .groupBy("vec_id")
          .agg(count(lit(1)).as("n_dims"),
            sum(col("code")).as("code_sum"),
            md5(concat_ws(",",
              sort_array(collect_list(struct(col("p"), col("code"))))
                .getField("code").cast("array<string>"))).as("code_md5"))
          .orderBy("vec_id")
      },
      Some("""WITH ex AS (
                SELECT vec_id, i AS p, CAST(embedding[i + 1] AS DOUBLE) AS x
                FROM (SELECT vec_id, embedding, unnest(range(len(embedding))) AS i
                      FROM embeddings) t),
              stats AS (SELECT p, MIN(x) AS lo, MAX(x) AS hi FROM ex GROUP BY p),
              codes AS (
                SELECT vec_id, ex.p,
                  CASE WHEN hi = lo THEN 0
                       ELSE CAST(FLOOR((x - lo) * 255.0 / (hi - lo)) AS BIGINT) END AS code
                FROM ex JOIN stats ON stats.p = ex.p)
              SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
                CAST(SUM(code) AS BIGINT) AS code_sum,
                md5(array_to_string(list(code ORDER BY p), ',')) AS code_md5
              FROM codes GROUP BY vec_id ORDER BY vec_id""")),

    // ANN quality measurement: recall@10 of the sign-LSH bucket search
    // (q43's scale path) against the exact top-10, per query vector.
    // The expensive cosine scoring runs ONCE; both rankings are
    // windows over that single frame (full ranking, and in-bucket
    // ranking via a (qid, in-bucket) partition), and recall is one
    // conditional aggregation — no exact×ann join, no re-scoring.
    QueryDef("q97_ann_recall",
      (s, d) => {
        import graft.functions.VectorExprs.cosineSim
        val emb = table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
            Similarity.signBucket(col("embedding"), 4).as("bucket"))
        val queries = emb.filter(col("vec_id") <= 4)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("bucket").as("qbucket"))
        val scored = emb.crossJoin(broadcast(queries))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            (col("bucket") === col("qbucket")).as("inb"),
            cosineSim(col("v"), col("qv")).as("cos"))
        val flagged = scored
          .withColumn("rn_exact", row_number().over(
            Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
          .withColumn("rn_ann", row_number().over(
            Window.partitionBy("qid", "inb").orderBy(col("cos").desc, col("vec_id"))))
        val isAnn = col("inb") && col("rn_ann") <= 10
        val agg = flagged.groupBy("qid").agg(
          count(when(isAnn, 1)).as("n_ann"),
          count(when(isAnn && col("rn_exact") <= 10, 1)).as("n_hit"))
        queries.select(col("qid"))
          .join(agg, Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("n_ann"), lit(0L)).as("n_ann"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)).cast(DoubleType) / 10.0).as("recall_at_10"))
          .orderBy("qid")
      },
      Some(s"""WITH e AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                  ${bucketSql(4)} AS bucket
                FROM embeddings),
              q AS (SELECT vec_id AS qid, v AS qv, bucket AS qbucket
                    FROM e WHERE vec_id <= 4),
              scored AS (
                SELECT q.qid, e.vec_id, e.bucket, q.qbucket,
                  list_cosine_similarity(e.v, q.qv) AS cos
                FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
              exact AS (
                SELECT qid, vec_id FROM
                  (SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cos DESC, vec_id) AS rn FROM scored) t
                WHERE rn <= 10),
              ann AS (
                SELECT qid, vec_id FROM
                  (SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cos DESC, vec_id) AS rn
                   FROM scored WHERE bucket = qbucket) t
                WHERE rn <= 10),
              ac AS (SELECT qid, COUNT(*) AS n_ann FROM ann GROUP BY qid),
              h AS (SELECT x.qid, COUNT(*) AS n_hit
                    FROM exact x JOIN ann a ON a.qid = x.qid AND a.vec_id = x.vec_id
                    GROUP BY x.qid)
              SELECT q.qid, COALESCE(ac.n_ann, 0) AS n_ann,
                COALESCE(h.n_hit, 0) AS n_hit,
                CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / 10.0 AS recall_at_10
              FROM q LEFT JOIN ac ON ac.qid = q.qid
                LEFT JOIN h ON h.qid = q.qid
              ORDER BY q.qid"""))
  )
}
