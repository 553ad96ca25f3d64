package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Pq
import QueryDef.table

/** Round-7 batch: exact duplicated-substring spans (the suffix-array
  * dedup of "Deduplicating Training Data Makes Language Models
  * Better", Lee et al. 2022, re-expressed as distributed window
  * hashing) and product quantization (Jégou et al. 2011) with every
  * code and ADC distance hash-verified cross-engine.
  */
object Extras25 {

  val all: Seq[QueryDef] = Seq(

    // Maximal duplicated token spans across documents — the exact-
    // substring dedup a suffix array gives on one machine, re-shaped
    // for a cluster: hash every W-token sliding window (W=8 here;
    // production uses ~50 — the testdata docs are themselves short),
    // keep hashes seen in >= 2 DISTINCT docs, then merge each doc's
    // overlapping duplicated windows into maximal spans (consecutive
    // window starts = overlapping windows = one span).
    //
    // Scale posture: the per-doc token array is bounded by doc length
    // (chunk pathological docs upstream with q71's chunker); window
    // hashes are computed map-side once per doc (transform over the
    // array, THEN posexplode — the array is not replicated per
    // window). The only corpus-wide shuffles are the hash groupBy
    // and the win⋈dup equi-join (dup is NOT broadcast — duplicated
    // hashes grow with corpus size). The island merge is a per-doc
    // window over *marked* starts only. No all-pairs anywhere: two
    // docs sharing a span never meet directly, only through the
    // hash key — 100 TB-safe by construction.
    QueryDef("q263_dup_spans",
      (s, d) => {
        val tokd = table(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("n", size(col("toks")))
          .filter(col("n") >= 8)
        val win = tokd
          .select(col("doc_id"), posexplode(
            expr("transform(sequence(1, n - 7), i -> md5(concat_ws(' ', slice(toks, i, 8))))")))
          .select(col("doc_id"), (col("pos") + 1).cast(LongType).as("wstart"),
            col("col").as("h"))
        val dup = win.groupBy("h")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select("h")
        val marked = win.join(dup, "h").select("doc_id", "wstart")
        val w = Window.partitionBy("doc_id").orderBy("wstart")
        marked
          .withColumn("grp", col("wstart") - row_number().over(w))
          .groupBy("doc_id", "grp")
          .agg(min(col("wstart")).as("span_start"),
            (max(col("wstart")) + 7).as("span_end"),
            count(lit(1)).as("n_windows"),
            (max(col("wstart")) - min(col("wstart")) + 8).as("span_len"))
          .select("doc_id", "span_start", "span_end", "n_windows", "span_len")
          .orderBy("doc_id", "span_start")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
              win AS (
                SELECT doc_id, CAST(t.i AS BIGINT) AS wstart,
                       md5(array_to_string(toks[t.i:t.i+7], ' ')) AS h
                FROM tok, UNNEST(generate_series(1, len(toks) - 7)) AS t(i)
                WHERE len(toks) >= 8),
              dup AS (SELECT h FROM win GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
              marked AS (SELECT w.doc_id, w.wstart FROM win w JOIN dup USING (h)),
              isl AS (SELECT doc_id, wstart,
                        wstart - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wstart) AS grp
                      FROM marked)
              SELECT doc_id, MIN(wstart) AS span_start, MAX(wstart) + 7 AS span_end,
                     COUNT(*) AS n_windows, MAX(wstart) - MIN(wstart) + 8 AS span_len
              FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""")),

    // Product quantization, encode side: 64-dim embeddings → m=4
    // subspaces × 16 dims, k=16 deterministic centroids per subspace
    // (the first 16 vectors — see ops/Pq.scala for why seeded).
    // Output is the per-subspace code histogram: 64 rows that pin
    // EVERY vector's argmin assignment — a single flipped code moves
    // two histogram cells, so the hash check covers the full encode.
    // The corpus side is map-only (broadcast codebook + per-row
    // argmin); the histogram is the only shuffle.
    QueryDef("q264_pq_codes",
      (s, d) => Pq.encode(table(s, d, "embeddings"), m = 4, ds = 16, k = 16)
        .groupBy(col("j").cast(LongType).as("subspace"),
          col("code").cast(LongType).as("code"))
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy("subspace", "code"),
      Some("""WITH sub AS (
                SELECT vec_id, t.j,
                       list_transform(embedding[(t.j*16+1):(t.j*16+16)],
                                      x -> CAST(x AS DOUBLE)) AS sv
                FROM embeddings, UNNEST([0,1,2,3]) AS t(j)),
              cb AS (SELECT vec_id AS c, j, sv AS cv FROM sub WHERE vec_id < 16),
              dist AS (
                SELECT s.vec_id, s.j, cb.c, list_distance(s.sv, cb.cv) AS dst
                FROM sub s JOIN cb ON s.j = cb.j),
              enc AS (
                SELECT vec_id, j, c AS code
                FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                                   ORDER BY dst, c) AS rn
                      FROM dist)
                WHERE rn = 1)
              SELECT CAST(j AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
                     COUNT(*) AS n_vectors
              FROM enc GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Product quantization, query side: ADC top-10 for probe vector
    // 0 — a 64-entry lookup table (query subvector → centroid squared
    // L2, broadcast), then codes ⋈ LUT + per-vector sum. The oracle
    // recomputes the same qq−2qc+cc decomposition, so the doubles
    // agree at oracle rounding; ranks are hash-verified, making this
    // the fully-verified PQ twin of the contract-checked sketches.
    QueryDef("q265_pq_adc_topk",
      (s, d) => Pq.adcTopK(table(s, d, "embeddings"), m = 4, ds = 16, k = 16,
        queryVecId = 0L, topK = 10),
      Some("""WITH sub AS (
                SELECT vec_id, t.j,
                       list_transform(embedding[(t.j*16+1):(t.j*16+16)],
                                      x -> CAST(x AS DOUBLE)) AS sv
                FROM embeddings, UNNEST([0,1,2,3]) AS t(j)),
              cb AS (SELECT vec_id AS c, j, sv AS cv FROM sub WHERE vec_id < 16),
              dist AS (
                SELECT s.vec_id, s.j, cb.c, list_distance(s.sv, cb.cv) AS dst
                FROM sub s JOIN cb ON s.j = cb.j),
              enc AS (
                SELECT vec_id, j, c AS code
                FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                                   ORDER BY dst, c) AS rn
                      FROM dist)
                WHERE rn = 1),
              lut AS (
                SELECT cb.j, cb.c,
                       list_inner_product(q.sv, q.sv)
                         - 2 * list_inner_product(q.sv, cb.cv)
                         + list_inner_product(cb.cv, cb.cv) AS d2
                FROM cb JOIN (SELECT j, sv FROM sub WHERE vec_id = 0) q
                  ON q.j = cb.j)
              SELECT e.vec_id, SUM(l.d2) AS adc_d2
              FROM enc e JOIN lut l ON e.j = l.j AND e.code = l.c
              WHERE e.vec_id >= 16
              GROUP BY e.vec_id ORDER BY adc_d2, vec_id LIMIT 10""")),

    // Column mapping, cross-engine: RENAME COLUMN is a metadata-only
    // commit (no data bytes move — the physical parquet keeps its
    // original column names forever; reads re-label at the boundary).
    // The lifecycle exercises rename → append under the NEW name →
    // DELETE with a logical predicate → second rename, and
    // fingerprints every version's LOGICAL view (row count, exact
    // cents sum, key hull, and the served column names). The oracle
    // recomputes each state straight from `customer` — the hash
    // proves both the data and the per-version name visibility that
    // time travel must preserve.
    QueryDef("q266_column_mapping",
      (s, d) => {
        import graft.sink.TxLogTable
        val t = QueryDef.scratch("graft_cm_q")
          .resolve("t").toString
        val cust = table(s, d, "customer").select(
          col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        TxLogTable.append(cust.filter(col("k") % 2 === 0), t)      // v1
        TxLogTable.renameColumn(s, t, "bal_c", "cents")            // v2
        TxLogTable.append(cust.filter(col("k") % 2 === 1)
          .withColumnRenamed("bal_c", "cents"), t)                 // v3
        TxLogTable.delete(s, t, "seg = 'BUILDING'")                // v4
        TxLogTable.renameColumn(s, t, "k", "cust_id")              // v5
        val snaps = (1L to 5L).map { v =>
          val df = TxLogTable.read(s, t, Some(v))
          val keyCol = df.columns.head // k before v5, cust_id after
          val balCol = if (df.columns.contains("cents")) "cents" else "bal_c"
          df.agg(count(lit(1)).as("n_rows"),
              sum(col(balCol)).as("cents_sum"),
              min(col(keyCol)).as("min_k"), max(col(keyCol)).as("max_k"))
            .select(lit(v).as("version"), col("n_rows"),
              col("cents_sum"), col("min_k"), col("max_k"),
              lit(df.columns.mkString(",")).as("cols"))
        }.reduce(_.unionAll(_))
        snaps.orderBy("version")
      },
      Some("""WITH b AS (SELECT c_custkey AS k, c_mktsegment AS seg,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS cents
                   FROM customer),
                   ev AS (SELECT * FROM b WHERE k % 2 = 0),
                   v4 AS (SELECT * FROM b WHERE seg <> 'BUILDING')
              SELECT 1 AS version, COUNT(*) AS n_rows,
                     CAST(SUM(cents) AS BIGINT) AS cents_sum,
                     MIN(k) AS min_k, MAX(k) AS max_k,
                     'k,seg,bal_c' AS cols FROM ev
              UNION ALL
              SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT), MIN(k), MAX(k),
                     'k,seg,cents' FROM ev
              UNION ALL
              SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT), MIN(k), MAX(k),
                     'k,seg,cents' FROM b
              UNION ALL
              SELECT 4, COUNT(*), CAST(SUM(cents) AS BIGINT), MIN(k), MAX(k),
                     'k,seg,cents' FROM v4
              UNION ALL
              SELECT 5, COUNT(*), CAST(SUM(cents) AS BIGINT), MIN(k), MAX(k),
                     'cust_id,seg,cents' FROM v4
              ORDER BY version""")),

    // IVF-PQ (non-residual): coarse quantizer (8 cells, full-vector
    // L2 argmin) routes the query to its 2 nearest inverted lists,
    // and only vectors in probed cells are ranked — by the q264/q265
    // PQ machinery (ADC lookups), never a raw float scan. This is the
    // standard two-level ANN layout at 100 TB: cell id as partition
    // key bounds each probe to ~nprobe/nlist of the corpus, and the
    // per-candidate cost is m byte lookups. Every cell assignment and
    // ADC distance is recomputed by the oracle — hash-verified, like
    // its building blocks.
    QueryDef("q267_ivfpq_topk",
      (s, d) => Pq.ivfAdcTopK(table(s, d, "embeddings"), m = 4, ds = 16,
        k = 16, nlist = 8, coarseBase = 16L, queryVecId = 0L,
        nprobe = 2, topK = 10),
      Some("""WITH emb AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
              cc AS (SELECT vec_id - 16 AS cell, v AS cv FROM emb
                     WHERE vec_id BETWEEN 16 AND 23),
              asg AS (SELECT vec_id, cell FROM (
                  SELECT e.vec_id, cc.cell,
                         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, cc.cv), cc.cell) AS rn
                  FROM emb e JOIN cc ON TRUE) WHERE rn = 1),
              probe AS (SELECT cell FROM (
                  SELECT cc.cell, ROW_NUMBER() OVER (
                           ORDER BY list_distance(q.v, cc.cv), cc.cell) AS rn
                  FROM cc JOIN (SELECT v FROM emb WHERE vec_id = 0) q ON TRUE)
                  WHERE rn <= 2),
              sub AS (
                SELECT vec_id, t.j,
                       list_transform(embedding[(t.j*16+1):(t.j*16+16)],
                                      x -> CAST(x AS DOUBLE)) AS sv
                FROM embeddings, UNNEST([0,1,2,3]) AS t(j)),
              cb AS (SELECT vec_id AS c, j, sv AS cv FROM sub WHERE vec_id < 16),
              dist AS (SELECT s.vec_id, s.j, cb.c,
                              list_distance(s.sv, cb.cv) AS dst
                       FROM sub s JOIN cb ON s.j = cb.j),
              enc AS (SELECT vec_id, j, c AS code
                      FROM (SELECT *, ROW_NUMBER() OVER (
                              PARTITION BY vec_id, j ORDER BY dst, c) AS rn
                            FROM dist) WHERE rn = 1),
              lut AS (SELECT cb.j, cb.c,
                             list_inner_product(q.sv, q.sv)
                               - 2 * list_inner_product(q.sv, cb.cv)
                               + list_inner_product(cb.cv, cb.cv) AS d2
                      FROM cb JOIN (SELECT j, sv FROM sub WHERE vec_id = 0) q
                        ON q.j = cb.j)
              SELECT e.vec_id AS vec_id, CAST(a.cell AS BIGINT) AS cell,
                     SUM(l.d2) AS adc_d2
              FROM enc e
              JOIN lut l ON e.j = l.j AND e.code = l.c
              JOIN asg a ON a.vec_id = e.vec_id
              JOIN probe p ON p.cell = a.cell
              WHERE e.vec_id >= 24
              GROUP BY e.vec_id, a.cell ORDER BY adc_d2, vec_id LIMIT 10""")),

    // ORC round-trip: the second columnar lake format Spark ships
    // (vectorized reader, predicate pushdown, zlib default). The
    // query writes a pruned lineitem projection as ORC, reads it back
    // with a pushed-down filter, and aggregates — the oracle computes
    // the same logical result straight from the parquet, so the hash
    // proves the ORC writer/reader preserve values exactly (integer
    // cents, no float drift). A lake ingesting from ORC-producing
    // upstreams (Hive warehouses) needs exactly this path.
    QueryDef("q268_orc_roundtrip",
      (s, d) => {
        val dir = QueryDef.scratch("graft_orc")
          .resolve("li").toString
        table(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_quantity"),
            expr("CAST(floor(l_extendedprice * 100.0) AS BIGINT)").as("price_c"))
          .write.mode("overwrite").orc(dir)
        s.read.orc(dir)
          .filter(col("l_quantity") >= 25.0)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("cents"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
                     CAST(SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT))
                          AS BIGINT) AS cents
              FROM lineitem WHERE l_quantity >= 25.0
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Schema-surgery lifecycle, cross-engine: rename → DROP COLUMN →
    // re-add the same logical name (fresh physical slot — the dropped
    // values must come back as NULL, never as the old bytes) → append
    // under the evolved schema → materializeColumns (rewrite under
    // logical names, clearing the mapping). Each version's fingerprint
    // (rows, exact cents sum, NON-NULL count of the re-added column,
    // served column names) is recomputed by the oracle — the
    // `n_seg = 0` rows after the re-add are the hash-verified proof
    // that tombstoned bytes never resurrect, and v6 == v5 proves the
    // materializing rewrite is content-neutral.
    QueryDef("q269_schema_surgery",
      (s, d) => {
        import graft.sink.TxLogTable
        val t = QueryDef.scratch("graft_ss_q")
          .resolve("t").toString
        val cust = table(s, d, "customer").select(
          col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        TxLogTable.append(cust.filter(col("k") % 2 === 0), t)        // v1
        TxLogTable.renameColumn(s, t, "bal_c", "cents")              // v2
        TxLogTable.dropColumn(s, t, "seg")                           // v3
        TxLogTable.addColumns(s, t,                                  // v4
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("seg",
              org.apache.spark.sql.types.StringType))))
        TxLogTable.append(cust.filter(col("k") % 2 === 1)            // v5
          .select(col("k"), col("bal_c").as("cents"), lit("NEW").as("seg")), t)
        TxLogTable.materializeColumns(s, t)                          // v6
        val snaps = (1L to 6L).map { v =>
          val df = TxLogTable.read(s, t, Some(v))
          val balCol = if (df.columns.contains("cents")) "cents" else "bal_c"
          val segCnt =
            if (df.columns.contains("seg")) count(col("seg"))
            else lit(0L)
          df.agg(count(lit(1)).as("n_rows"),
              sum(col(balCol)).as("cents_sum"), segCnt.as("n_seg"))
            .select(lit(v).as("version"), col("n_rows"),
              col("cents_sum"), col("n_seg").cast(LongType).as("n_seg"),
              lit(df.columns.mkString(",")).as("cols"))
        }.reduce(_.unionAll(_))
        snaps.orderBy("version")
      },
      Some("""WITH b AS (SELECT c_custkey AS k, c_mktsegment AS seg,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS cents
                   FROM customer),
                   ev AS (SELECT * FROM b WHERE k % 2 = 0),
                   al AS (SELECT * FROM b)
              SELECT 1 AS version, COUNT(*) AS n_rows,
                     CAST(SUM(cents) AS BIGINT) AS cents_sum,
                     COUNT(*) AS n_seg, 'k,seg,bal_c' AS cols FROM ev
              UNION ALL
              SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT), COUNT(*),
                     'k,seg,cents' FROM ev
              UNION ALL
              SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT), 0,
                     'k,cents' FROM ev
              UNION ALL
              SELECT 4, COUNT(*), CAST(SUM(cents) AS BIGINT), 0,
                     'k,cents,seg' FROM ev
              UNION ALL
              SELECT 5, COUNT(*), CAST(SUM(cents) AS BIGINT),
                     (SELECT COUNT(*) FROM b WHERE k % 2 = 1),
                     'k,cents,seg' FROM al
              UNION ALL
              SELECT 6, COUNT(*), CAST(SUM(cents) AS BIGINT),
                     (SELECT COUNT(*) FROM b WHERE k % 2 = 1),
                     'k,cents,seg' FROM al
              ORDER BY version"""))
  )
}
