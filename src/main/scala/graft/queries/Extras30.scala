package graft.queries

import org.apache.spark.sql.functions._
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
          .localCheckpoint()
        val drops = graft.ops.Dedup
          .semanticDupPairsPrunedFromAssignment(fv, asg, "vec_id", "v", tau = 0.35)
          .groupBy("cell").agg(count(lit(1)).as("n_dropped"))
        asg.groupBy("cell").agg(count(lit(1)).as("n_docs"))
          .join(drops, Seq("cell"), "left")
          .na.fill(0L, Seq("n_dropped"))
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
              asg AS (SELECT vec_id, cell, d2 FROM (
                  SELECT e.vec_id, cc.cell, ${d2Sql("e.v", "cc.cv")} AS d2,
                         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY ${d2Sql("e.v", "cc.cv")}, cc.cell) AS rn
                  FROM emb e JOIN cc ON TRUE) WHERE rn = 1),
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
              ORDER BY d.cell"""))
  )
}
