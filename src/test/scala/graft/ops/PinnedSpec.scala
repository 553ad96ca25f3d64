package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Pinned.release]] and the ops-wide unpersist discipline: every
  * `localCheckpoint()` an operator pins is released before it
  * returns, except the single checkpoint backing the returned frame.
  */
class PinnedSpec extends SparkSpec {
  import spark.implicits._

  private def pinnedCount: Int = spark.sparkContext.getPersistentRDDs.size

  private def dropAll(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

  test("release frees a localCheckpoint's blocks; non-checkpoint frames are a no-op") {
    dropAll()
    val base = pinnedCount
    val ck = Seq((1L, "a"), (2L, "b")).toDF("id", "v").localCheckpoint()
    assert(pinnedCount === base + 1)
    Pinned.release(ck)
    assert(pinnedCount === base)
    // projections over a checkpoint are not the checkpoint — no-op
    val ck2 = Seq((1L, "a")).toDF("id", "v").localCheckpoint()
    Pinned.release(ck2.select(col("id")))
    assert(pinnedCount === base + 1)
    Pinned.release(ck2)
  }

  test("pinWithChangedCount: one materialization carries the flag count; frame is a releasable pin") {
    dropAll()
    val base = pinnedCount
    val df = Seq((1L, false), (2L, true), (3L, true)).toDF("id", "__changed")
    val (pinned, n) = Pinned.pinWithChangedCount(df, "__changed")
    assert(n === 2L)
    assert(pinnedCount === base + 1)
    // the frame reads the materialized blocks and keeps the schema
    assert(pinned.columns.toSeq === Seq("id", "__changed"))
    assert(pinned.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    assert(Pinned.count(pinned) === 3L) // direct LogicalRDD fast path
    Pinned.release(pinned)
    assert(pinnedCount === base)
    // all-false flags (the fixpoint signal) report zero
    val (p2, z) = Pinned.pinWithChangedCount(
      Seq((9L, false)).toDF("id", "__changed"), "__changed")
    assert(z === 0L)
    Pinned.release(p2)
  }

  test("duplicateClusters routes are result-identical (AQE-off small loop vs AQE-on large loop)") {
    // chain + pair: needs multiple rounds; smallGraphMaxEdges = 0
    // forces the scale route (AQE on, no conf scoping)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val small = Corpus.duplicateClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val large = Corpus.duplicateClusters(pairs, smallGraphMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(small === large)
    assert(small === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
    dropAll()
  }

  test("duplicateClusters restores AQE and shuffle-partition confs after the small-graph loop") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val shuf = spark.conf.get("spark.sql.shuffle.partitions")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    Corpus.duplicateClusters(pairs).collect()
    assert(spark.conf.get("spark.sql.adaptive.enabled") === aqe)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === shuf)
    dropAll()
  }

  test("duplicateClusters leaves exactly one pin (the returned labels) and stays correct") {
    dropAll()
    val base = pinnedCount
    // two components: {1,2,3} via 1-2, 2-3 and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val out = Corpus.duplicateClusters(pairs)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    assert(pinnedCount === base + 1,
      "intermediate rounds and the edge pin must be released; only the result stays")
    dropAll()
  }

  test("triangleStats and pageRankFixedPoint release their edge pins") {
    dropAll()
    val base = pinnedCount
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val t = Graph.triangleStats(edges).head()
    assert(t.getLong(2) === 1L)
    assert(pinnedCount === base + 1, "only the 1-row result checkpoint may remain")
    dropAll()
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val pr = Graph.pageRankFixedPoint(sym, iters = 3)
    assert(pr.count() === 3L)
    assert(pinnedCount === base + 1, "only the result checkpoint may remain")
    dropAll()
  }

  test("skyline releases the staircase pin, keeps input + pref checkpoints") {
    dropAll()
    val base = pinnedCount
    val df = Seq((1L, 10L, 5L), (2L, 20L, 3L), (3L, 15L, 9L), (4L, 20L, 7L))
      .toDF("id", "mx", "mn")
    // dominated: (1,10,5) by (2,20,3); (3,15,9) by (2,20,3); (4,20,7) by (2,20,3)
    val ids = Frontier.skyline(df, "mx", "mn").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
    // ranged must be released; the input pin (read by the staircase
    // AND the dominance join — without it the input lineage executes
    // twice) and pref stay, both caller-owned
    assert(pinnedCount === base + 2,
      "ranged must be released; input + pref stay (caller-owned)")
    dropAll()
  }
}
