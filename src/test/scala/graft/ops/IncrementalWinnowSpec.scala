package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental winnowing-fingerprint near-dup (`Dedup.winnowSelect` +
  * `Dedup.lshIndex` + `Dedup.fingerprintDupIncremental`): an arriving
  * batch fingerprints ONLY itself and probes the stored fingerprint
  * index — it must score exactly the distinct-shared-fingerprint
  * counts a batch-side intersection computes, never re-read seen
  * text, respect the write-time hot cap, and keep a plan whose shape
  * does not grow with the seen-corpus row count. Also pins the
  * winnowSelect tie-rule contract: rightmost-tie and tie-inclusive
  * selection produce the SAME distinct fingerprint set per doc.
  */
class IncrementalWinnowSpec extends SparkSpec {
  import spark.implicits._

  /** 3-token grams + winnow(w=4) over (doc_id, text) → distinct
    * (doc_id, band=0, sig) fingerprints — the q318 stage. */
  private def fps(docs: DataFrame): DataFrame = {
    val tokd = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("ng", (size(col("toks")) - 2).cast("long"))
      .filter(col("ng") >= 4)
    val grams = tokd.select(col("doc_id"), col("ng"), posexplode(
        expr("transform(sequence(1, CAST(ng AS INT)), " +
          "i -> md5(concat_ws(' ', slice(toks, i, 3))))")))
      .select(col("doc_id"), col("ng"),
        (col("pos") + 1).cast("long").as("p"), col("col").as("h"))
    Dedup.winnowSelect(grams, "doc_id", w = 4)
      .select(col("doc_id"), lit(0).as("band"), col("h").as("sig"))
      .distinct()
  }

  private def probe(newDocs: DataFrame, index: DataFrame,
      minShared: Int = 2): Set[(Long, Long, Long)] =
    Dedup.fingerprintDupIncremental(fps(newDocs), index, "doc_id", minShared)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // a shared 9-token run guarantees shared fingerprints (w+k-1 = 6
  // token minimum); docs 1/2 share a long run, 3 is disjoint prose
  private val seenDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (2L, "prefix words alpha beta gamma delta epsilon zeta eta theta iota end"),
    (3L, "completely different prose about spark adaptive query execution planning")
  ).toDF("doc_id", "text")

  test("incremental probe equals the batch-side fingerprint intersection exactly") {
    val seenFps = fps(seenDocs).localCheckpoint()
    val index = Dedup.lshIndex(seenFps, "doc_id", maxIdsPerSig = 64)
      .localCheckpoint()
    val arriving = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (11L, "unrelated sentence mentioning spark adaptive query execution planning topics"),
      (12L, "nothing in common with anything stored here at all whatsoever today")
    ).toDF("doc_id", "text")
    val got = probe(arriving, index)
    // ground truth: distinct-fingerprint intersection counts computed
    // batch-side from both sides' full fingerprint sets
    val af = fps(arriving).select(col("doc_id").as("new_id"), col("sig"))
    val sf = seenFps.select(col("doc_id").as("seen_id"), col("sig"))
    val expected = af.join(sf, "sig")
      .groupBy("new_id", "seen_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.exists { case (n, s, _) => n == 10L && s == 1L },
      "the exact copy must match its original")
    assert(!got.exists { case (n, _, _) => n == 12L },
      "a disjoint doc must match nothing")
  }

  test("tie rules select the same distinct fingerprint set per doc") {
    // force hash ties: a doc of repeated token runs makes equal gram
    // hashes adjacent, exercising the rightmost-vs-inclusive split
    val docs = Seq(
      (1L, "a b c a b c a b c a b c a b c"),
      (2L, "x y x y x y x y x y x y")
    ).toDF("doc_id", "text")
    val tokd = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("ng", (size(col("toks")) - 2).cast("long"))
    val grams = tokd.select(col("doc_id"), col("ng"), posexplode(
        expr("transform(sequence(1, CAST(ng AS INT)), " +
          "i -> md5(concat_ws(' ', slice(toks, i, 3))))")))
      .select(col("doc_id"), col("ng"),
        (col("pos") + 1).cast("long").as("p"), col("col").as("h"))
    def set(rightmost: Boolean) =
      Dedup.winnowSelect(grams, "doc_id", 4, rightmostTies = rightmost)
        .select("doc_id", "h").distinct()
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(set(rightmost = true) === set(rightmost = false))
    // and the rightmost rule selects no MORE positions than inclusive
    def positions(rightmost: Boolean) =
      Dedup.winnowSelect(grams, "doc_id", 4, rightmostTies = rightmost).count()
    assert(positions(rightmost = true) <= positions(rightmost = false))
  }

  test("replayed ids never self-match") {
    val seenFps = fps(seenDocs).localCheckpoint()
    val index = Dedup.lshIndex(seenFps, "doc_id", maxIdsPerSig = 64)
      .localCheckpoint()
    // re-ingesting the seen batch itself: identical fingerprints
    // collide everywhere, the self-pair filter drops them; only the
    // genuine 1<->2 overlap re-emits (exactly-once of the output
    // append is the txn tag's job, not the op's)
    val got = probe(seenDocs, index)
    assert(got.forall { case (n, s, _) => n != s })
    assert(got.map { case (n, s, _) => (n, s) } === Set((1L, 2L), (2L, 1L)))
  }

  test("hot fingerprints dropped at index write time bound every future probe") {
    // 9 docs sharing one long run: every fingerprint of that run has
    // 9 members, over a cap of 4 — boilerplate stops generating
    // candidates (MOSS's too-common filter)
    val boiler = (1L to 9L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val index = Dedup.lshIndex(fps(boiler), "doc_id", maxIdsPerSig = 4)
      .localCheckpoint()
    assert(index.count() === 0L)
    val another = Seq((100L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    assert(probe(another, index) === Set.empty)
  }

  test("batch-stage plan is INDEPENDENT of the seen-corpus size") {
    // with the index pinned (as a production pipeline stores it), the
    // fingerprint+probe plan must be identical in shape for a 3-doc
    // and a 300-doc seen corpus
    def indexOf(n: Int): DataFrame = Dedup.lshIndex(
        fps(spark.range(n).selectExpr("id AS doc_id",
          "concat_ws(' ', 'tok', CAST(id AS STRING), 'alpha beta gamma " +
            "delta epsilon zeta eta theta') AS text")),
        "doc_id", maxIdsPerSig = 64)
      .localCheckpoint()
    val batch = Seq((100000L,
      "tok 1 alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    def shape(index: DataFrame): String =
      Dedup.fingerprintDupIncremental(fps(batch), index, "doc_id", 2)
        .queryExecution.optimizedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("\\bid=#x\\b", "")
    assert(shape(indexOf(3)) === shape(indexOf(300)))
  }
}
