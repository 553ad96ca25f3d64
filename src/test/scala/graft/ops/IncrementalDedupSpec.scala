package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental SemDeDup (`Dedup.semanticDupIncremental`): the batch
  * stage must (a) apply the pruned regime's contract — one cosine
  * against the STORED per-cell representative — and (b) cost the
  * same whatever the seen corpus size, because its only inputs are
  * the arriving batch and the k-row state frames.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val cents = Seq(
    (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("cell", "cv")

  test("arrivals are dropped against the stored representative, not re-clustered") {
    // seen corpus: rep of cell 0 is id 1 (closest to centroid);
    // rep of cell 1 is id 4
    val seen = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.8, 0.2)),
      (4L, Array(0.0, 1.0))).toDF("vec_id", "v")
    val reps = Dedup.cellRepresentatives(seen, cents, "vec_id", "v")
    assert(reps.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 1L), (1L, 4L)))
    // arriving batch: 10 dups rep-of-cell-0, 11 is novel in cell 0
    // (near the centroid axis but far enough to stay under tau),
    // 12 dups rep-of-cell-1
    val batch = Seq(
      (10L, Array(0.99, 0.01)),
      (11L, Array(0.55, 0.45)),
      (12L, Array(0.02, 0.97))).toDF("vec_id", "v")
    val drops = Dedup.semanticDupIncremental(
        batch, reps, cents, "vec_id", "v", tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(drops === Set((0L, 1L, 10L), (1L, 4L, 12L)))
  }

  test("replayed state ids never self-drop") {
    val seen = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "v")
    val reps = Dedup.cellRepresentatives(seen, cents, "vec_id", "v")
    // the batch (wrongly but tolerably) replays the rep itself
    val drops = Dedup.semanticDupIncremental(
      seen, reps, cents, "vec_id", "v", tau = 0.5)
    assert(drops.count() === 0L)
  }

  test("batch-stage plan is INDEPENDENT of the seen-corpus size") {
    // the state is k rows however large the seen corpus was; with the
    // state pinned (as a production pipeline stores it), the batch
    // stage's optimized plan must be IDENTICAL in shape for a 4-row
    // and a 4000-row seen corpus — the receipt that batch N+1 never
    // pays for batch 1..N. (Expression/RDD ids differ per run;
    // normalize them away before comparing.)
    def repsOf(seenSize: Int): DataFrame = {
      val seen = spark.range(seenSize).selectExpr("id AS vec_id",
        "array(CAST(id % 7 AS DOUBLE) / 7.0, CAST(id % 5 AS DOUBLE) / 5.0) AS v")
      Dedup.cellRepresentatives(seen, cents, "vec_id", "v").localCheckpoint()
    }
    val batch = Seq((100L, Array(0.9, 0.1)), (101L, Array(0.1, 0.9)))
      .toDF("vec_id", "v")
    def shape(reps: DataFrame): String =
      Dedup.semanticDupIncremental(batch, reps, cents, "vec_id", "v", 0.9)
        .queryExecution.optimizedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("\\bid=#x\\b", "")
    assert(shape(repsOf(4)) === shape(repsOf(4000)))
  }

  test("matches the pruned regime's verdict for a batch assigned to unchanged cells") {
    // if the whole corpus HAD been processed in one pruned pass with
    // the same centroids and the same elected reps, the new members'
    // drop set must agree with the incremental result — the two paths
    // implement one contract
    val seen = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.7, 0.3)),
      (4L, Array(0.0, 1.0))).toDF("vec_id", "v")
    val batch = Seq(
      (10L, Array(0.98, 0.02)), (11L, Array(0.4, 0.6)),
      (12L, Array(0.05, 0.99))).toDF("vec_id", "v")
    val reps = Dedup.cellRepresentatives(seen, cents, "vec_id", "v")
    val inc = Dedup.semanticDupIncremental(
        batch, reps, cents, "vec_id", "v", tau = 0.9)
      .select("drop_id").as[Long].collect().toSet
    val full = Dedup.semanticDupPairsPruned(
        seen.union(batch), cents, "vec_id", "v", tau = 0.9)
      .select("drop_id").as[Long].collect().toSet
    // reps election over seen∪batch can only change if a NEW vector
    // sits closer to a centroid than the old rep — not the case here,
    // so the full pass's verdict on ids >= 10 equals the incremental
    assert(full.filter(_ >= 10L) === inc)
  }
}
