package graft.queries

import org.apache.spark.sql.functions._
import QueryDef.table

/** Round-7 depth batch: the SQL catalog surface. Everything here runs
  * through `spark.sql` against the `graft` [[graft.sources.GraftCatalog]]
  * (DSv2 TableCatalog over TxLog tables) — no library calls, no temp
  * views — and the DuckDB oracle recomputes the same lifecycle
  * straight from the source tables, so the hash proves the catalog's
  * CREATE / INSERT / DELETE / time-travel semantics, not just its
  * plumbing.
  */
object Extras24 {

  /** One shared catalog per session (catalog plugins initialize once);
    * table names are unique per invocation so re-runs never collide.
    */
  private def ensureCatalog(s: org.apache.spark.sql.SparkSession): Unit = {
    if (s.conf.getOption("spark.sql.catalog.graft").isEmpty) {
      val wh = QueryDef.scratch("graft_cat_wh").toString
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    }
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.lake")
  }

  val all: Seq[QueryDef] = Seq(

    // Catalog SQL lifecycle, cross-engine: CREATE TABLE in the graft
    // catalog, INSERT INTO from `customer`, a second incremental
    // INSERT, DELETE FROM with a predicate, and VERSION AS OF reads of
    // every intermediate state — all through spark.sql against the V2
    // TableCatalog. The output fingerprints each version (count, cents
    // sum, key hull); the oracle recomputes the same states straight
    // from `customer`. Version numbering: CREATE=1, the inserts are
    // 2 and 3, the delete is 4.
    QueryDef("q259_catalog_sql",
      (s, d) => {
        ensureCatalog(s)
        val t = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
        table(s, d, "customer").createOrReplaceTempView("cust_src")
        s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, seg STRING, bal_c BIGINT)")
        s.sql(s"""INSERT INTO graft.lake.$t
                  SELECT c_custkey, c_mktsegment,
                         CAST(floor(c_acctbal * 100.0) AS BIGINT)
                  FROM cust_src WHERE c_custkey % 2 = 0""")
        s.sql(s"""INSERT INTO graft.lake.$t
                  SELECT c_custkey, c_mktsegment,
                         CAST(floor(c_acctbal * 100.0) AS BIGINT)
                  FROM cust_src WHERE c_custkey % 2 = 1""")
        s.sql(s"DELETE FROM graft.lake.$t WHERE seg = 'BUILDING'")
        val snaps = Seq(1L, 2L, 3L, 4L).map { v =>
          s.sql(s"""SELECT $v AS version, COUNT(*) AS n_rows,
                           COALESCE(CAST(SUM(bal_c) AS BIGINT), 0) AS bal_cents,
                           COALESCE(MIN(k), -1) AS min_k,
                           COALESCE(MAX(k), -1) AS max_k
                    FROM graft.lake.$t VERSION AS OF $v""")
        }.reduce(_.unionAll(_))
        snaps.orderBy("version")
      },
      Some("""WITH b AS (SELECT c_custkey AS k, c_mktsegment AS seg,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c
                   FROM customer),
                   v2 AS (SELECT * FROM b WHERE k % 2 = 0),
                   v4 AS (SELECT * FROM b WHERE seg <> 'BUILDING')
              SELECT 1 AS version, 0 AS n_rows, 0 AS bal_cents,
                     -1 AS min_k, -1 AS max_k
              UNION ALL
              SELECT 2, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM v2
              UNION ALL
              SELECT 3, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM b
              UNION ALL
              SELECT 4, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM v4
              ORDER BY version""")),

    // Merge-on-read deletion vectors, cross-engine: v1 appends the
    // customer projection as 4 files, v2 and v3 are DV deletes (a
    // segment, then every 7th key) that move NO data bytes — each
    // commits a (file, row index) mask and readers apply it as one
    // anti-join — and v4 compacts, materializing the mask and
    // retiring the vectors. The output fingerprints every version
    // (time travel through the DV history), the post-compact state
    // (must equal v3 exactly — version 40 row), and the change feed
    // of both DV commits (newly-masked rows only, so a key already
    // masked by v2 never re-appears under v3). The oracle recomputes
    // everything from `customer`.
    QueryDef("q260_deletion_vectors",
      (s, d) => {
        val t = QueryDef.scratch("graft_dv")
          .resolve("cust").toString
        val base = table(s, d, "customer").select(
          col("c_custkey").as("k"),
          col("c_mktsegment").as("seg"),
          expr("CAST(floor(c_acctbal * 100.0) AS BIGINT)").as("bal_c"))
        graft.sink.TxLogTable.append(base.repartition(4), t)        // v1
        val v2 = graft.sink.TxLogTable.deleteVectors(s, t, "seg = 'MACHINERY'")
        val v3 = graft.sink.TxLogTable.deleteVectors(s, t, "k % 7 = 0")
        val v4 = graft.sink.TxLogTable.compact(s, t,
          smallFileBytes = 1L << 30)                                // materialize
        def snapAt(label: Long, v: Long) =
          graft.sink.TxLogTable.read(s, t, Some(v))
            .groupBy(lit(label).as("version"))
            .agg(count(lit(1)).as("n_rows"), sum(col("bal_c")).as("bal_cents"),
              min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        val snaps = Seq(snapAt(1L, 1L), snapAt(2L, v2), snapAt(3L, v3),
          snapAt(40L, v4))
        val feed = graft.sink.TxLogTable.changes(s, t, 1L, v3)
          .groupBy((col("_commit_version") * 10 +
            when(col("_change_type") === "insert", 1).otherwise(2))
            .as("version"))
          .agg(count(lit(1)).as("n_rows"), sum(col("bal_c")).as("bal_cents"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        snaps.reduce(_.unionAll(_)).unionAll(feed).orderBy("version")
      },
      Some("""WITH b AS (SELECT c_custkey AS k, c_mktsegment AS seg,
                     CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal_c
                   FROM customer),
                   v2 AS (SELECT * FROM b WHERE seg <> 'MACHINERY'),
                   v3 AS (SELECT * FROM v2 WHERE k % 7 <> 0),
                   d2 AS (SELECT * FROM b WHERE seg = 'MACHINERY'),
                   d3 AS (SELECT * FROM v2 WHERE k % 7 = 0)
              SELECT 1 AS version, COUNT(*) AS n_rows,
                     CAST(SUM(bal_c) AS BIGINT) AS bal_cents,
                     MIN(k) AS min_k, MAX(k) AS max_k FROM b
              UNION ALL
              SELECT 2, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM v2
              UNION ALL
              SELECT 3, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM v3
              UNION ALL
              SELECT 40, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM v3
              UNION ALL
              SELECT 22, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM d2
              UNION ALL
              SELECT 32, COUNT(*), CAST(SUM(bal_c) AS BIGINT), MIN(k), MAX(k) FROM d3
              ORDER BY version""")),

    // Quality-classifier INFERENCE at corpus scale — the fasttext-ish
    // shape every training-data pipeline runs: hashed bag-of-bigram
    // features, a linear model whose weight for feature f is a pure
    // hash (portable md5 → [-500, 500], standing in for trained
    // weights), document score = sum of feature weights, label =
    // sign. Map-only per document (no shuffle until the tiny
    // lang×source aggregate), codegen-friendly higher-order functions,
    // integer arithmetic end to end — at 100 TB this is one pass over
    // the corpus with a 25-row result. The oracle recomputes the
    // same model in DuckDB list comprehensions.
    QueryDef("q261_quality_classifier",
      (s, d) => {
        table(s, d, "documents")
          .withColumn("w", split(col("text"), " "))
          .withColumn("feats", expr(
            "CASE WHEN size(w) < 2 THEN array() " +
              "ELSE transform(sequence(0, size(w) - 2), " +
              "i -> concat(w[i], '_', w[i + 1])) END"))
          .withColumn("wsum", expr(
            "aggregate(feats, CAST(0 AS BIGINT), (acc, f) -> acc + " +
              "(CAST(conv(substring(md5(f), 1, 4), 16, 10) AS BIGINT) % 1001) - 500)"))
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("wsum") > 0, 1L).otherwise(0L)).as("pos_docs"),
            sum(col("wsum")).as("weight_sum"),
            sum(size(col("feats")).cast("long")).as("n_feats"))
          .orderBy("lang", "source")
      },
      Some("""WITH f AS (
                SELECT lang, source,
                       COALESCE(list_sum(list_transform(feats,
                         f -> CAST(CAST('0x' || substr(md5(f), 1, 4) AS INTEGER)
                                AS BIGINT) % 1001 - 500)), 0) AS wsum,
                       len(feats) AS nf
                FROM (SELECT lang, source,
                        [w[i] || '_' || w[i + 1]
                         for i in range(1, len(w))] AS feats
                      FROM (SELECT lang, source,
                              string_split(text, ' ') AS w
                            FROM documents)))
              SELECT lang, source, COUNT(*) AS n_docs,
                     CAST(SUM(CASE WHEN wsum > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS pos_docs,
                     CAST(SUM(wsum) AS BIGINT) AS weight_sum,
                     CAST(SUM(nf) AS BIGINT) AS n_feats
              FROM f GROUP BY 1, 2 ORDER BY lang, source""")),

    // Hilbert-curve layout key, verified through its CONTRACT (the
    // q66/q67 pattern): over the full 64×64 grid the curve must be a
    // bijection onto [0, 4096) — checked by exact integer moments —
    // and every consecutive pair of curve positions must be ADJACENT
    // cells (|Δx|+|Δy| = 1, the property that makes Hilbert files
    // carry tighter min/max envelopes than Morton's diagonal jumps;
    // computed Spark-side with one lag window and asserted TRUE by
    // the oracle). Any wrong rotation/reflection in the walk breaks
    // adjacency within the first few cells.
    QueryDef("q262_hilbert_curve",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val grid = s.range(0, 4096L).select(
          (col("id") / 64L).cast("long").as("x"),
          (col("id") % 64L).as("y"))
        val h = grid.select(col("x"), col("y"),
          graft.ops.Layout.hilbertValue(col("x"), col("y"), 6).as("hv"))
        val w = Window.orderBy("hv")
        h.select(col("hv"), col("x"), col("y"),
            lag("x", 1).over(w).as("px"), lag("y", 1).over(w).as("py"))
          .agg(
            count(lit(1)).as("n_cells"),
            countDistinct(col("hv")).as("n_distinct"),
            min(col("hv")).as("min_h"), max(col("hv")).as("max_h"),
            sum(col("hv")).as("sum_h"),
            min(when(col("px").isNotNull,
              abs(col("x") - col("px")) + abs(col("y") - col("py")))
              .otherwise(lit(1L))).as("min_step"),
            max(when(col("px").isNotNull,
              abs(col("x") - col("px")) + abs(col("y") - col("py")))
              .otherwise(lit(1L))).as("max_step"))
          .withColumn("is_bijection",
            col("n_distinct") === 4096L && col("min_h") === 0L &&
              col("max_h") === 4095L && col("sum_h") === lit(4096L * 4095L / 2))
          .withColumn("all_steps_adjacent",
            col("min_step") === 1L && col("max_step") === 1L)
      },
      Some("""SELECT 4096 AS n_cells, 4096 AS n_distinct,
                     0 AS min_h, 4095 AS max_h,
                     CAST(4096 * 4095 / 2 AS BIGINT) AS sum_h,
                     1 AS min_step, 1 AS max_step,
                     TRUE AS is_bijection, TRUE AS all_steps_adjacent""")))
}
