package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint collapses case and whitespace variants") {
    val docs = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "entirely different")).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length === 2)
    val dup = groups.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") === 1L)
  }

  test("dedupKeepFirst keeps the min-order row per key deterministically") {
    val df = Seq((1L, "a", 30L), (1L, "a", 10L), (1L, "a", 20L), (2L, "b", 5L))
      .toDF("k1", "k2", "ord")
    val out = Dedup.dedupKeepFirst(df, Seq("k1", "k2"), "ord")
      .orderBy("k1").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq === Seq((1L, 10L), (2L, 5L)))
  }

  test("shingles builds distinct word n-grams; short docs fall back to whole text") {
    val df = Seq(("a b c d", 1)).toDF("text", "id")
    val sh = df.select(Dedup.shingles(col("text"), 3).as("s")).head().getSeq[String](0)
    assert(sh.toSet === Set("a b c", "b c d"))
    val short = Seq(("a b", 1)).toDF("text", "id")
      .select(Dedup.shingles(col("text"), 3).as("s")).head().getSeq[String](0)
    assert(short === Seq("a b"))
  }

  test("minhash is deterministic and order-insensitive over the token set") {
    val df = Seq(("x y z", "z y x")).toDF("t1", "t2")
    val r = df.select(
      Dedup.minhash(array_distinct(split(col("t1"), " ")), 0).as("m1"),
      Dedup.minhash(array_distinct(split(col("t2"), " ")), 0).as("m2")).head()
    assert(r.getString(0) === r.getString(1))
  }

  test("lshCandidatePairs surfaces identical docs and orders pairs id1<id2") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, "completely unrelated content with nothing shared at all here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", Dedup.shingles(col("text"), 3))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((3L, 10L)))
  }

  test("lshCandidatePairs drops hot buckets over maxBucketSize and never self-pairs") {
    val same = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((1L to 5L).map(i => (i, same)) :+ (1L, same)) // duplicate id 1
      .toDF("doc_id", "text")
    // every doc shares every band sig → bucket size 6 > cap 4 → dropped
    val capped = Dedup.lshCandidatePairs(docs, "doc_id", Dedup.shingles(col("text"), 3),
      maxBucketSize = 4)
    assert(capped.count() === 0)
    // uncapped: pairs flow, but the duplicate id never emits (1,1)
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", Dedup.shingles(col("text"), 3),
      maxBucketSize = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(!pairs.exists { case (a, b) => a == b })
  }

  test("jaccard of identical sets is 1, disjoint is 0") {
    val df = Seq(("a b c", "a b c", "x y")).toDF("t1", "t2", "t3")
    val r = df.select(
      Dedup.jaccard(split(col("t1"), " "), split(col("t2"), " ")).as("same"),
      Dedup.jaccard(split(col("t1"), " "), split(col("t3"), " ")).as("disjoint")).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("semanticDupPairs finds planted near-dups within cells; more cells never add pairs") {
    // two well-separated clusters around (1,0,0,0) and (0,1,0,0);
    // ids 10/11 and 20/21 are planted near-duplicates (cos ~ 1),
    // cross-cluster cosines ~ 0
    def v(x: Double, y: Double, eps: Double) = Array(x, y, eps, 0.0)
    val vecs = Seq(
      (10L, v(1.0, 0.0, 0.00)), (11L, v(1.0, 0.0, 0.01)),
      (12L, v(0.9, 0.1, 0.30)),
      (20L, v(0.0, 1.0, 0.00)), (21L, v(0.0, 1.0, 0.01)),
      (22L, v(0.1, 0.9, 0.30))).toDF("id", "v")
    val cents2 = Seq((0L, v(1.0, 0.0, 0.0)), (1L, v(0.0, 1.0, 0.0)))
      .toDF("cell", "cv")
    val got = Dedup.semanticDupPairs(vecs, cents2, "id", "v", tau = 0.999)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((10L, 11L), (20L, 21L)),
      s"expected exactly the planted dup pairs, got $got")
    // a FINER quantizer (scale path: k ~ sqrt(n)) can only shrink the
    // candidate space — never invent pairs
    val cents4 = Seq((0L, v(1.0, 0.0, 0.0)), (1L, v(0.0, 1.0, 0.0)),
      (2L, v(0.9, 0.1, 0.3)), (3L, v(0.1, 0.9, 0.3))).toDF("cell", "cv")
    val finer = Dedup.semanticDupPairs(vecs, cents4, "id", "v", tau = 0.999)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(finer.subsetOf(got))
  }

  test("semanticDupPairsPruned compares against the cell representative only") {
    def v(x: Double, y: Double, eps: Double) = Array(x, y, eps, 0.0)
    // one cluster around (1,0): id 10 sits ON the centroid (the
    // representative), 11 is its near-dup, 12 is distant
    val vecs = Seq(
      (10L, v(1.0, 0.0, 0.00)), (11L, v(1.0, 0.0, 0.01)),
      (12L, v(0.3, 0.0, 0.95)),
      (20L, v(0.0, 1.0, 0.00)), (21L, v(0.0, 1.0, 0.01))).toDF("id", "v")
    val cents = Seq((0L, v(1.0, 0.0, 0.0)), (1L, v(0.0, 1.0, 0.0)))
      .toDF("cell", "cv")
    val rows = Dedup.semanticDupPairsPruned(vecs, cents, "id", "v", tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reps are 10 (cell 0) and 20 (cell 1); drops are exactly the
    // planted near-dups, never the representative itself
    assert(rows === Set((0L, 10L, 11L), (1L, 20L, 21L)),
      s"expected (cell,rep,drop) = planted near-dups, got $rows")
  }

  test("semanticDupPrunedCensusFromAssignment equals the composed two-pass census") {
    def v(x: Double, y: Double, eps: Double) = Array(x, y, eps, 0.0)
    val vecs = Seq(
      (10L, v(1.0, 0.0, 0.00)), (11L, v(1.0, 0.0, 0.01)),
      (12L, v(0.3, 0.0, 0.95)),
      (20L, v(0.0, 1.0, 0.00)), (21L, v(0.0, 1.0, 0.01)),
      (22L, v(0.0, 0.9, 0.30))).toDF("id", "v")
    val cents = Seq((0L, v(1.0, 0.0, 0.0)), (1L, v(0.0, 1.0, 0.0)))
      .toDF("cell", "cv")
    val asg = Dedup.assignCellsWithDist(vecs, cents, "id", "v")
    val census = Dedup
      .semanticDupPrunedCensusFromAssignment(vecs, asg, "id", "v", tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // composed reference: drop-row count per cell + member census,
    // the two-pass shape the one-pass census replaced
    val drops = Dedup
      .semanticDupPairsPrunedFromAssignment(vecs, asg, "id", "v", tau = 0.999)
      .groupBy("cell").agg(count(lit(1)).as("n_dropped"))
    val expected = asg.groupBy("cell").agg(count(lit(1)).as("n_docs"))
      .join(drops, Seq("cell"), "left").na.fill(0L, Seq("n_dropped"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(census === expected, s"census $census != composed $expected")
    // sanity on the planted geometry: each cell holds three members
    // (rep + planted near-dup + far member), drops exactly the
    // near-dup, never the representative or the far member
    assert(census === Set((0L, 3L, 1L), (1L, 3L, 1L)))
  }

  test("pruned recall tradeoff: a dup pair both-far-from-rep is missed, exact finds it") {
    def v(x: Double, y: Double, eps: Double) = Array(x, y, eps, 0.0)
    // id 1 is nearest the centroid -> representative; 2 and 3 are a
    // planted dup PAIR far from the rep (orthogonal-ish to it)
    val vecs = Seq(
      (1L, v(1.0, 0.0, 0.0)),
      (2L, v(0.0, 1.0, 0.00)),
      (3L, v(0.0, 1.0, 0.01))).toDF("id", "v")
    val cents = Seq((0L, v(1.0, 0.0, 0.0))).toDF("cell", "cv")
    val exact = Dedup.semanticDupPairs(vecs, cents, "id", "v", tau = 0.999)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(exact === Set((2L, 3L)))
    val pruned = Dedup.semanticDupPairsPruned(vecs, cents, "id", "v", tau = 0.999)
    assert(pruned.count() === 0L,
      "the documented linear-regime miss: both members far from the representative")
    // tightening the quantizer (one more cell near the pair) restores it
    val cents2 = Seq((0L, v(1.0, 0.0, 0.0)), (1L, v(0.0, 1.0, 0.0)))
      .toDF("cell", "cv")
    val restored = Dedup.semanticDupPairsPruned(vecs, cents2, "id", "v", tau = 0.999)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(restored === Set((2L, 3L)))
  }

  test("semanticDup routes by corpus count: exact under the ceiling, pruned above, plan flips") {
    // cell 0 holds a near-rep dup (1,2) AND a planted far-from-rep dup
    // pair (3,7); cell 1 holds a near-rep dup (4,5) and a loner (6).
    val vecs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.99, 0.01)),
      (3L, Array(0.6, 0.35)), (7L, Array(0.61, 0.34)),
      (4L, Array(0.0, 1.0)), (5L, Array(0.01, 0.98)),
      (6L, Array(-1.0, 0.2))).toDF("vec_id", "v")
    val cents = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("cell", "cv")
    def drops(ceiling: Long) = Dedup.semanticDup(
      vecs, cents, "vec_id", "v", tau = 0.9,
      corpusCount = 7L, exactMaxRows = ceiling)
    val exact = drops(7L)   // count == ceiling -> exact regime
    val pruned = drops(6L)  // count > ceiling -> pruned regime
    val exactSet = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prunedSet = pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact catches the far-from-rep pair (drops 7); pruned misses it —
    // the documented linear-regime recall tradeoff, here proving the
    // ceiling crossing actually flipped the executed operator
    assert(exactSet === Set((0L, 2L), (0L, 7L), (1L, 5L)))
    assert(prunedSet === Set((0L, 2L), (1L, 5L)))
    assert(exact.queryExecution.optimizedPlan.toString !==
      pruned.queryExecution.optimizedPlan.toString,
      "the regime switch must change the plan, not just filter rows")
    // default ceiling: a small corpus stays in the exact regime
    val routedDefault = Dedup.semanticDup(
      vecs, cents, "vec_id", "v", tau = 0.9, corpusCount = 7L)
    assert(routedDefault.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === exactSet)
  }

  test("ExactRegimeMaxRows is derived from the TOTAL-pair budget") {
    // at k ~ sqrt(n) cells the exact regime's total pair count is
    // k·(n/k)²/2 = n^1.5/2 (NOT the per-cell (n/k)²/2 — the round-12
    // scaladoc's conflation); the ceiling must be the largest n whose
    // total fits ExactPairBudget: n ≤ (2B)^(2/3)
    val b = Dedup.ExactPairBudget.toDouble
    assert(Dedup.ExactRegimeMaxRows ===
      math.floor(math.pow(2.0 * b, 2.0 / 3.0)).toLong)
    val n = Dedup.ExactRegimeMaxRows.toDouble
    assert(math.pow(n, 1.5) / 2.0 <= b,
      "total pairs at the ceiling must fit the budget")
    assert(math.pow(n + 1.0, 1.5) / 2.0 > b,
      "one row above the ceiling must exceed the budget")
    // magnitude sanity: ~2.6M rows at B = 2^31, not the old 2^24
    assert(Dedup.ExactRegimeMaxRows > (1L << 21) &&
      Dedup.ExactRegimeMaxRows < (1L << 22))
  }

  test("assignCellsWithDist ties break to the smallest cell id, d2 is exact") {
    def v(x: Double, y: Double) = Array(x, y, 0.0, 0.0)
    val vecs = Seq((7L, v(0.5, 0.5))).toDF("id", "v")
    // two centroids EQUIDISTANT from the vector — min(struct) must pick cell 1
    val cents = Seq((2L, v(1.0, 0.0)), (1L, v(0.0, 1.0))).toDF("cell", "cv")
    val r = Dedup.assignCellsWithDist(vecs, cents, "id", "v").head()
    assert(r.getAs[Long]("cell") === 1L)
    assert(r.getAs[Double]("d2") === 0.5) // (0.5)^2 + (0.5)^2, exact in binary
  }
}
