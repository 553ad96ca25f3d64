package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental MinHash-LSH near-dup (`Dedup.lshIndex` +
  * `Dedup.lshDupIncremental`): an arriving batch probes the STORED
  * band index and verifies against the STORED signature table — it
  * must never need the seen corpus's text, its candidates must be
  * bounded by the index's write-time hot-signature cap, and its plan
  * must not grow with the seen-corpus row count.
  */
class IncrementalLshSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val RPB = 2

  private def sigs(df: DataFrame): DataFrame =
    Dedup.minhashSignatures(df, "doc_id", Dedup.shingles(col("text"), 3), K)

  private def state(seen: DataFrame): (DataFrame, DataFrame) = {
    val sg = sigs(seen).localCheckpoint()
    val idx = Dedup.lshIndex(
      Dedup.lshBandsFromSignatures(sg, "doc_id", K, RPB), "doc_id")
      .localCheckpoint()
    (sg, idx)
  }

  test("an arriving near-dup matches its seen twin; novel text matches nothing") {
    val seen = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely unrelated text about distributed query planning engines")
    ).toDF("doc_id", "text")
    val (sg1, idx) = state(seen)
    val batch = Seq(
      // identical to doc 1 — every minhash agrees
      (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (11L, "novel content that shares no shingle with anything seen before ever")
    ).toDF("doc_id", "text")
    val out = Dedup.lshDupIncremental(sigs(batch), sg1, idx,
        "doc_id", K, RPB, minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((10L, 1L, 8L))) // identical text: all 8 agree
  }

  test("n_match is the Broder estimator: partial overlap agrees on some hashes only") {
    val seen = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")
    ).toDF("doc_id", "text")
    val (sg1, idx) = state(seen)
    // same prefix, different tail: some shingles shared, some not
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta completely different ending here")
    ).toDF("doc_id", "text")
    val out = Dedup.lshDupIncremental(sigs(batch), sg1, idx,
        "doc_id", K, RPB, minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // if any band collided, n_match is in [2, 8); never the full 8
    // (the tails differ so at least one minhash must differ... unless
    // md5 order puts all 8 minima in the shared prefix — with 8
    // independent seeds over ~10 shared vs ~4 distinct shingles that
    // would make n_match 8, so assert the estimator range loosely)
    out.foreach { case (_, _, m) => assert(m >= 2L && m <= 8L) }
  }

  test("replayed ids never self-match") {
    val seen = Seq((1L, "some document text that is long enough to shingle properly"))
      .toDF("doc_id", "text")
    val (sg1, idx) = state(seen)
    val out = Dedup.lshDupIncremental(sigs(seen), sg1, idx,
      "doc_id", K, RPB, minMatches = 2)
    assert(out.count() === 0L)
  }

  test("hot signatures are dropped at index WRITE time, bounding every future probe") {
    // 20 copies of a stop-phrase: every band bucket has 20 members,
    // over the cap of 8 — the index stores nothing for them
    val seen = (1L to 20L).map(i => (i, "call now to claim your free prize today"))
      .toDF("doc_id", "text")
    val sg1 = sigs(seen).localCheckpoint()
    val idx = Dedup.lshIndex(
      Dedup.lshBandsFromSignatures(sg1, "doc_id", K, RPB),
      "doc_id", maxIdsPerSig = 8).localCheckpoint()
    assert(idx.count() === 0L)
    val batch = Seq((100L, "call now to claim your free prize today"))
      .toDF("doc_id", "text")
    val out = Dedup.lshDupIncremental(sigs(batch), sg1, idx,
      "doc_id", K, RPB, minMatches = 2)
    assert(out.count() === 0L)
  }

  test("batch-stage plan is INDEPENDENT of the seen-corpus size") {
    // with the two state frames pinned (as a production pipeline
    // stores them), the probe+verify plan must be identical in shape
    // for a 4-row and a 4000-row seen corpus
    def stateOf(n: Int): (DataFrame, DataFrame) = state(
      spark.range(n).selectExpr("id AS doc_id",
        "concat('document number ', id, ' with some filler words ', " +
          "id % 13, ' ', id % 7, ' appended for shingling') AS text"))
    val batch = Seq((100000L, "document number 3 with some filler words 3 3 appended for shingling"))
      .toDF("doc_id", "text")
    def shape(st: (DataFrame, DataFrame)): String =
      Dedup.lshDupIncremental(sigs(batch), st._1, st._2,
          "doc_id", K, RPB, minMatches = 2)
        .queryExecution.optimizedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("\\bid=#x\\b", "")
        // lambda variables carry a per-session counter, not shape
        .replaceAll("x_\\d+", "x_n")
    assert(shape(stateOf(4)) === shape(stateOf(4000)))
  }
}
