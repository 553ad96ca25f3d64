package graft.ops

import graft.SparkSpec

/** The pigeonhole recall contract of [[Dedup.hammingNearDupPairs]]
  * (4 bands × 15 bits, maxHamming 3 — q313/q314's configuration),
  * probed with SYNTHETIC hashes whose pairwise Hamming distances are
  * constructed exactly — the one thing the text-derived oracle gates
  * cannot pin, because natural payloads don't come with chosen
  * distances.
  */
class PhashBandingSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(hs: Seq[(Long, Long)], maxBucket: Int = 64) =
    Dedup.hammingNearDupPairs(hs.toDF("id", "ah"), "id", "ah",
        bits = 15, bands = 4, maxHamming = 3, maxBucketSize = maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def flip(h: Long, bitPositions: Int*): Long =
    bitPositions.foldLeft(h)((acc, b) => acc ^ (1L << b))

  test("every Hamming<=3 pair is found, including flips split across three bands") {
    val base = 0x0123456789ABCL & ((1L << 60) - 1)
    val hs = Seq(
      10L -> base,
      11L -> base,                    // distance 0 (identical hash, distinct id)
      12L -> flip(base, 3),           // distance 1, single band
      13L -> flip(base, 3, 17),       // distance 2 across bands 0 and 1
      14L -> flip(base, 3, 17, 33))   // distance 3 across bands 0, 1, 2
    val got = pairs(hs)
    // all C(5,2) = 10 pairs sit within Hamming <= 3+3 of each other;
    // the ones within <= 3 of EACH OTHER must all surface
    assert(got.contains((10L, 11L, 0L)))
    assert(got.contains((10L, 12L, 1L)))
    assert(got.contains((10L, 13L, 2L)))
    assert(got.contains((10L, 14L, 3L)))
    assert(got.contains((12L, 13L, 1L)))  // they differ only at bit 17
    // nothing above the gate leaks through
    assert(got.forall(_._3 <= 3L))
  }

  test("a Hamming-4 pair straddling all four bands is dropped by banding") {
    val base = 0x00000F0F0F0F0L & ((1L << 60) - 1)
    // one flip in each 15-bit band: no intact band, so the pair is
    // never a candidate — the documented boundary of the exact-<=3
    // contract (maxHamming < bands is exactly what the require pins)
    val hs = Seq(1L -> base, 2L -> flip(base, 0, 15, 30, 45))
    assert(pairs(hs) === Set.empty)
  }

  test("a Hamming-4 pair inside ONE band is banded as a candidate but rejected by verify") {
    val base = 0x00000F0F0F0F0L & ((1L << 60) - 1)
    // four flips all in band 2: bands 0, 1, 3 intact -> candidate,
    // then bit_count(xor) = 4 > 3 kills it in the verify stage
    val hs = Seq(1L -> base, 2L -> flip(base, 31, 32, 33, 34))
    assert(pairs(hs) === Set.empty)
  }

  test("pigeonhole property: ANY <=3-bit corruption of a random hash is recalled") {
    val rnd = new scala.util.Random(4242)
    val cases = (1 to 24).map { i =>
      val base = rnd.nextLong() & ((1L << 60) - 1)
      val nFlips = 1 + rnd.nextInt(3)
      val bits = rnd.shuffle((0 until 60).toList).take(nFlips)
      // ids spaced so cross-case coincidences can't mask a miss
      (i.toLong * 2, base, i.toLong * 2 + 1, flip(base, bits: _*), nFlips.toLong)
    }
    val hs = cases.flatMap { case (i1, h1, i2, h2, _) => Seq(i1 -> h1, i2 -> h2) }
    val got = pairs(hs)
    cases.foreach { case (i1, h1, i2, h2, d) =>
      val expected = java.lang.Long.bitCount(h1 ^ h2).toLong
      assert(expected <= d) // flips may coincide; never exceed
      assert(got.contains((i1, i2, expected)),
        s"pair ($i1,$i2) at Hamming $expected must be recalled")
    }
  }

  test("hot buckets above maxBucketSize are dropped; the cap bounds pair fan-out") {
    // 65 ids share the ALL-ZERO hash: every band bucket holds 65 > 64
    // members -> dropped, zero pairs (a hash that common among
    // DISTINCT payloads is a blank/solid template, not near-dup signal)
    val hot = (1L to 65L).map(_ -> 0L)
    assert(pairs(hot) === Set.empty)
    // at 64 members the bucket survives: C(64,2) = 2016 pairs
    assert(pairs(hot.take(64)).size === 64 * 63 / 2)
  }

  test("the exactness require: maxHamming must stay under the band count") {
    val df = Seq(1L -> 0L).toDF("id", "ah")
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(df, "id", "ah",
        bits = 15, bands = 4, maxHamming = 4, maxBucketSize = 64)
    }
    intercept[IllegalArgumentException] { // 64th bit would hit DuckDB's sign trap
      Dedup.hammingNearDupPairs(df, "id", "ah",
        bits = 16, bands = 4, maxHamming = 3, maxBucketSize = 64)
    }
  }
}
