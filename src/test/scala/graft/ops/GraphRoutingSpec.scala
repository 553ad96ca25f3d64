package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Routed co-partitioning for the iterative graph family
  * (`Graph.largeVertexState` + `Graph.pinEdges`): below the broadcast
  * threshold the plain pin runs (AQE broadcasts node-sized state —
  * the round-13 measurement showed a pre-partitioned pin LOSES
  * there), above it the edge pin pre-partitions on the per-round join
  * key and the superstep joins read it exchange-free. Both routes
  * must be bit-identical — the route moves exchanges, never results.
  */
class GraphRoutingSpec extends SparkSpec {
  import spark.implicits._

  // ring + chords: every node has degree >= 2, communities exist
  private def symEdges(n: Int): DataFrame = {
    val e = (0L until n.toLong).map(i => (i, (i + 1) % n)) ++
      (0L until n.toLong by 7).map(i => (i, (i + 3) % n))
    val d = e.filter { case (u, v) => u != v }.toDF("src", "dst")
    d.unionAll(d.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  private def oriented(n: Int): DataFrame =
    symEdges(n).filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))

  test("largeVertexState derives from the session's broadcast threshold") {
    val t = spark.sessionState.conf.autoBroadcastJoinThreshold
    assert(t > 0)
    assert(!Graph.largeVertexState(spark, t / 24))
    assert(Graph.largeVertexState(spark, t / 24 + 1))
  }

  test("pagerank / LPA / triangles are bit-identical on both routes") {
    val sym = symEdges(200)
    val e = oriented(200)
    // force the route: a claimed vertex count far over any threshold
    val big = Some(Long.MaxValue / 64)
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(Graph.pageRankFixedPoint(sym, 2)) ===
      rows(Graph.pageRankFixedPoint(sym, 2, vertexCount = big)))
    assert(rows(Graph.labelPropagation(sym, 2)) ===
      rows(Graph.labelPropagation(sym, 2, vertexCount = big)))
    assert(rows(Graph.triangleStats(e)) ===
      rows(Graph.triangleStats(e, vertexCount = big)))
    assert(rows(Graph.triangleStats(e, orientByDegree = true)) ===
      rows(Graph.triangleStats(e, orientByDegree = true, vertexCount = big)))
  }

  // round-15 pin-key A/B (the r14 verdict's task 1): for BOTH
  // iterative ops the winning pin key is the per-round JOIN key (dst
  // for LPA, src for pagerank), NOT the aggregate key. The aggregate's
  // input is the join OUTPUT — partitioned by the join key after the
  // SMJ, so no edge pin can pre-cluster it on the aggregate key —
  // while the join side re-shuffles the FULL edge list every round
  // the pin key doesn't match. Both keys must stay bit-identical;
  // the exchange count decides the winner. (Below the threshold the
  // pin key is ignored by construction — pinEdges pins plain.)
  test("LPA pin-key A/B: dst (join key) deletes exchanges src cannot") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      def run(pinKey: String): (Int, Seq[String]) = {
        val plans = scala.collection.mutable.ArrayBuffer.empty[String]
        val out = Pinned.withAuditTap(plans += _) {
          val l = Graph.labelPropagationPinned(symEdges(300), 3,
            route = true, pinKey = pinKey)
          plans += l.queryExecution.executedPlan.toString
          l
        }
        val rows = out.collect().map(_.toString).sorted.toSeq
        Pinned.release(out)
        (plans.map(p =>
          "Exchange hashpartitioning".r.findAllIn(p).length).sum, rows)
      }
      val (exDst, rowsDst) = run("dst")
      val (exSrc, rowsSrc) = run("src")
      assert(rowsDst === rowsSrc, "pin key must never change results")
      assert(exDst < exSrc,
        s"dst pin (join key) should delete per-round edge exchanges: dst=$exDst src=$exSrc")
    } finally spark.conf.set(key, saved)
  }

  test("pagerank pin-key A/B: src (join key) deletes exchanges dst cannot") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      def run(pinKey: String): (Int, Seq[String]) = {
        val plans = scala.collection.mutable.ArrayBuffer.empty[String]
        val out = Pinned.withAuditTap(plans += _) {
          val pr = Graph.pageRankPinned(symEdges(300), 3,
            scale = 1000000000000L, route = true, pinKey = pinKey)
          plans += pr.queryExecution.executedPlan.toString
          pr
        }
        val rows = out.collect().map(_.toString).sorted.toSeq
        Pinned.release(out)
        (plans.map(p =>
          "Exchange hashpartitioning".r.findAllIn(p).length).sum, rows)
      }
      val (exSrc, rowsSrc) = run("src")
      val (exDst, rowsDst) = run("dst")
      assert(rowsDst === rowsSrc, "pin key must never change results")
      assert(exSrc < exDst,
        s"src pin (join key) should delete per-round edge exchanges: src=$exSrc dst=$exDst")
    } finally spark.conf.set(key, saved)
  }

  // round-16: triangleStats routes on its own measured edge count
  // (required output anyway). Below the broadcast budget BOTH
  // intersection joins are BroadcastHashJoins over ONE reused build
  // of the pinned adjacency; above it (or when the caller's census
  // forces largeVertexState) the SMJ form with the u-co-partitioned
  // pin runs. The route moves exchanges, never the three counts.
  test("triangleStats broadcast route: BHJ both joins, one reused build, budget flips to SMJ") {
    val e = oriented(200)
    def plansOf(body: => DataFrame): (Seq[String], Seq[String]) = {
      val plans = scala.collection.mutable.ArrayBuffer.empty[String]
      val out = Pinned.withAuditTap(plans += _)(body)
      val rows = out.collect().map(_.toString).sorted.toSeq
      Pinned.release(out)
      (plans.toSeq, rows)
    }
    val (bPlans, bRows) = plansOf(Graph.triangleStats(e))
    // the triangle-sum plan is the one pinning the final one-row
    // output — the only audited plan containing the intersection joins
    val triPlan = bPlans.filter(_.contains("array_intersect")) match {
      case Seq(p) => p
      case ps     => ps.mkString("\n")
    }
    assert("BroadcastHashJoin".r.findAllIn(triPlan).length >= 2,
      "small adjacency should broadcast both intersection joins")
    assert("BroadcastExchange".r.findAllIn(triPlan).length >= 2 &&
      triPlan.contains("Scan ExistingRDD"),
      "both broadcast builds read the pinned adjacency checkpoint, not the groupBy")
    assert(!triPlan.contains("SortMergeJoin"),
      "the broadcast route must not sort-merge the probe side")
    // tiny budget flips to the SMJ/co-partitioned form (no explicit
    // broadcast hint — whether AQE later broadcasts at runtime is its
    // call on tiny test data; what the route guarantees is identity)
    val (_, sRows) = plansOf(Graph.triangleStats(e, broadcastBudgetBytes = 1L))
    assert(bRows === sRows, "broadcast budget must never change the counts")
    // forced-large census also matches (covered in the routes test,
    // re-asserted here against the tiny-budget form)
    val (_, fRows) = plansOf(Graph.triangleStats(e, vertexCount = Some(Long.MaxValue / 64)))
    assert(fRows === sRows)
  }

  test("pagerank on an empty edge list returns an empty (node, pr) frame") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = Graph.pageRankFixedPoint(empty, iters = 2)
    assert(out.columns.toSeq === Seq("node", "pr"))
    assert(out.count() === 0L)
  }

  test("two-hop reach routes on the degree census; both forms bit-identical") {
    val sym = symEdges(200).select(col("src").as("u"), col("dst").as("v"))
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    // bit-identity of the two forms
    assert(rows(Graph.twoHopGather(sym)) === rows(Graph.twoHopRows(sym)))
    // the router: gather below the hub boundary, row form above it
    def plan(maxDeg: Option[Long]): String =
      Graph.twoHopReach(sym, maxDeg).queryExecution.optimizedPlan.toString
    assert(!plan(None).contains("LeftAnti"))
    assert(!plan(Some(1000L)).contains("LeftAnti"),
      "a bounded-degree census stays on the gather form")
    assert(plan(Some(1L << 20)).contains("LeftAnti"),
      "a hub census flips to the AQE-splittable row form")
    // and the routed results match on both sides of the flip
    assert(rows(Graph.twoHopReach(sym, Some(1000L))) ===
      rows(Graph.twoHopReach(sym, Some(1L << 20))))
  }

  test("above threshold the pre-partitioned pin deletes per-round exchanges") {
    // disable broadcast so the superstep joins would otherwise SMJ
    // with BOTH sides exchanging — the regime the route exists for
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      def exchanges(vertexCount: Option[Long]): Int = {
        val plans = scala.collection.mutable.ArrayBuffer.empty[String]
        val out = Pinned.withAuditTap(plans += _) {
          val pr = Graph.pageRankFixedPoint(symEdges(300), 2,
            vertexCount = vertexCount)
          plans += pr.queryExecution.executedPlan.toString
          pr
        }
        Pinned.release(out)
        plans.map(p => "Exchange hashpartitioning".r.findAllIn(p).length).sum
      }
      val off = exchanges(None)
      val on = exchanges(Some(Long.MaxValue / 64))
      assert(on < off,
        s"route-on should delete edge-side exchanges: on=$on off=$off")
    } finally spark.conf.set(key, saved)
  }
}
