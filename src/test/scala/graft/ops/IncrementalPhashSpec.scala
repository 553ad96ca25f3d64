package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental perceptual-hash near-dup (`Dedup.hammingBands` +
  * `Dedup.lshIndex` + `Dedup.hammingDupIncremental`): an arriving
  * batch probes the STORED band index and verifies against the
  * STORED 8-byte hashes — it must find exactly the cross-split pairs
  * the batch op (`hammingNearDupPairs`) finds, never re-read seen
  * payloads, respect the write-time hot-signature cap, and keep a
  * plan whose shape does not grow with the seen-corpus row count.
  */
class IncrementalPhashSpec extends SparkSpec {
  import spark.implicits._

  private val BITS = 15
  private val BANDS = 4
  private val MAXH = 3

  private def state(seen: DataFrame, cap: Int = 64): (DataFrame, DataFrame) = {
    val h = seen.localCheckpoint()
    val idx = Dedup.lshIndex(
        Dedup.hammingBands(h, "doc_id", "ah", BITS, BANDS), "doc_id", cap)
      .localCheckpoint()
    (h, idx)
  }

  private def probe(newH: DataFrame, st: (DataFrame, DataFrame)): Set[(Long, Long, Long)] =
    Dedup.hammingDupIncremental(newH, st._1, st._2,
        "doc_id", "ah", BITS, BANDS, MAXH)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental probe equals the batch op's cross-split pairs exactly") {
    // deterministic 60-bit hashes: a base value + controlled bit flips
    val base = 0x0123456789ABCL & ((1L << 60) - 1)
    def flip(h: Long, bits: Int*): Long = bits.foldLeft(h)((a, b) => a ^ (1L << b))
    val seen = Seq(
      (1L, base),
      (2L, flip(base, 5, 20, 40, 55)),    // hamming 4 from base — outside gate
      (3L, ~base & ((1L << 60) - 1))      // far from everything
    ).toDF("doc_id", "ah")
    val arriving = Seq(
      (10L, flip(base, 7)),               // hamming 1 from 1
      (11L, flip(base, 3, 17, 59)),       // hamming 3 from 1 (3 bands touched)
      (12L, flip(base, 5, 20, 40, 55, 9)) // hamming 1 from 2, 5 from 1
    ).toDF("doc_id", "ah")
    val got = probe(arriving, state(seen))
    // ground truth: the batch op over the union, restricted to
    // cross-split pairs (id1 seen, id2 arriving — ids sorted)
    val expected = Dedup.hammingNearDupPairs(
        seen.unionAll(arriving), "doc_id", "ah", BITS, BANDS, MAXH,
        maxBucketSize = 64)
      .filter(col("id1") <= 3 && col("id2") >= 10)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2))).toSet
    assert(got === expected)
    assert(got === Set((10L, 1L, 1L), (11L, 1L, 3L), (12L, 2L, 1L)))
  }

  test("replayed ids never self-match") {
    // a batch re-ingested after a failed commit re-probes itself:
    // identical (id, hash) rows collide in every band but the
    // self-pair filter drops them (pairs between DISTINCT replayed
    // docs re-emit — exactly-once of the output append is the txn
    // tag's job, not the op's)
    val mask = (1L << 60) - 1
    val seen = Seq((1L, 100L), (2L, ~100L & mask)).toDF("doc_id", "ah")
    val st = state(seen)
    assert(probe(seen, st) === Set.empty)
  }

  test("hot signatures dropped at index write time bound every future probe") {
    // 20 identical hashes: every band bucket has 20 members, over a
    // cap of 8 — the stored index is empty and the probe finds nothing
    val seen = (1L to 20L).map(i => (i, 0xABCDEL)).toDF("doc_id", "ah")
    val st = state(seen, cap = 8)
    assert(st._2.count() === 0L)
    assert(probe(Seq((100L, 0xABCDEL)).toDF("doc_id", "ah"), st) === Set.empty)
  }

  test("pigeonhole contract is enforced: maxHamming >= bands rejected") {
    val st = state(Seq((1L, 1L)).toDF("doc_id", "ah"))
    intercept[IllegalArgumentException] {
      Dedup.hammingDupIncremental(Seq((2L, 1L)).toDF("doc_id", "ah"),
        st._1, st._2, "doc_id", "ah", BITS, BANDS, maxHamming = 4)
    }
  }

  test("batch-stage plan is INDEPENDENT of the seen-corpus size") {
    // with the two state frames pinned (as a production pipeline
    // stores them), the probe+verify plan must be identical in shape
    // for a 4-row and a 4000-row seen corpus
    def stateOf(n: Int): (DataFrame, DataFrame) = state(
      spark.range(n).selectExpr("id AS doc_id",
        s"CAST(id * 524287 % ${1L << 60} AS BIGINT) AS ah"))
    val batch = Seq((100000L, 524287L)).toDF("doc_id", "ah")
    def shape(st: (DataFrame, DataFrame)): String =
      Dedup.hammingDupIncremental(batch, st._1, st._2,
          "doc_id", "ah", BITS, BANDS, MAXH)
        .queryExecution.optimizedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("\\bid=#x\\b", "")
    assert(shape(stateOf(4)) === shape(stateOf(4000)))
  }
}
