package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge lists.
  *
  * A 100 TB training-data lake is full of implicit graphs — item
  * co-occurrence, document duplicate clusters, citation/link webs —
  * and the operations a pipeline needs on them (motif counts for
  * connectivity QA, centrality for source weighting) must run as
  * shuffles over edge lists, never as adjacency matrices or
  * driver-side graph objects. Everything here is DataFrame joins and
  * aggregations on (src, dst) pairs:
  *
  *  - edges shuffle by vertex key, so a 1000-executor cluster splits
  *    the adjacency by hash — no single task ever holds the graph;
  *  - iteration state (PageRank mass) is a (node, value) table
  *    re-joined to the edge list each round — the Pregel pattern
  *    expressed as Catalyst plans, so AQE still re-plans skew;
  *  - all arithmetic is 64-bit-integer fixed-point, making results
  *    bit-identical across engines AND across partitionings (double
  *    summation order never enters).
  */
object Graph {

  /** Count-derived route for the iterative ops: does the per-vertex
    * state frame (rank/label/adjacency — `rowBytes` a row) outgrow
    * the session's broadcast threshold? Below it, AQE broadcasts the
    * node-sized frame every superstep and the per-round joins are
    * already exchange-free on the edge side — the round-13
    * measurement showed an unconditional pre-partitioned pin LOSES
    * there (the up-front exchange+sort buys nothing; SCALE.md
    * "co-partitioned pins measured"). Above it the joins fall back
    * to SMJ and a pre-partitioned edge pin deletes the edge-side
    * exchange from EVERY superstep — the classic Pregel layout. Same
    * router discipline as `Dedup.semanticDup`: the caller passes the
    * count it already knows (vertex counts live in table stats /
    * manifests at lakehouse scale); the threshold is derived, not
    * pinned.
    */
  def largeVertexState(spark: org.apache.spark.sql.SparkSession,
      vertexCount: Long, rowBytes: Long = 24L): Boolean =
    vertexCount * rowBytes > spark.sessionState.conf.autoBroadcastJoinThreshold

  /** Pin an edge frame for per-superstep reuse — pre-partitioned on
    * `key` when `coPartition` (the [[largeVertexState]] route), plain
    * otherwise. Under AQE a checkpoint's LogicalRDD advertises
    * UnknownPartitioning even when the data is hash-placed (one
    * reason the round-13 unconditional experiment saw no superstep
    * saving), so the route stamps the layout it just guaranteed —
    * `repartition(n, key)` is REPARTITION_BY_NUM, never coalesced —
    * back onto the pinned frame; every downstream join/groupBy on
    * `key` then reads it exchange-free.
    */
  def pinEdges(edges: DataFrame, key: String, coPartition: Boolean): DataFrame =
    if (coPartition) {
      val n = edges.sparkSession.sessionState.conf.numShufflePartitions
      org.apache.spark.sql.graftshim.ColumnShim.withDeclaredHashPartitioning(
        Pinned.pin(edges.repartition(n, col(key))), key, n)
    } else Pinned.pin(edges)

  /** Undirected co-occurrence edges: items sharing a group key.
    *
    * Basket-collect form, not a self-join: ONE map-side-combined
    * groupBy collects each group's distinct item set (sorted), and
    * the u < v pair expansion runs in-row via the slice pattern
    * ([[Dedup.lshCandidatePairsFromBands]]) — the raw fact shuffles
    * once (by `groupCol`, partial collect_set combining map-side)
    * where the self-join form paid a (g, i) distinct AND a join pass
    * over it. Pair expansion is bounded by the per-group item count
    * (order baskets are small and bounded by the business domain,
    * unlike the global item count) — identical quadratic-per-basket
    * output under either form, this one without the second shuffle.
    * Emits each edge once as (u, v) with u < v.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    df.select(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .groupBy("__g").agg(sort_array(collect_set(col("__i"))).as("__is"))
      .select(posexplode(col("__is")).as(Seq("__x", "u")), col("__is"))
      .select(col("u"),
        explode(slice(col("__is"), col("__x") + 2, size(col("__is")))).as("v"))
      .distinct()

  /** Triangle count over an oriented (u < v) edge list.
    *
    * Adjacency-intersection form: triangles = Σ over edges (u,v) of
    * |N⁺(u) ∩ N⁺(v)|. The naive alternative — a wedge self-join
    * closed by a probe join — materializes every wedge as a shuffled
    * row (~40M at sf0.1 on the part graph, O(Σ deg²) in general);
    * this form shuffles only the compact out-adjacency table (one row
    * per vertex, list bounded by oriented out-degree) and does the
    * intersection per edge inside codegen. AQE broadcasts the
    * adjacency when it fits.
    *
    * `orientByDegree = true` re-orients each edge from its
    * (degree, id)-smaller endpoint before building the adjacency: any
    * total order on vertices makes the orientation acyclic and counts
    * each triangle exactly once, and degree order bounds every
    * out-list by O(√E) — a celebrity vertex with 10M neighbors stops
    * producing a 10M-element out-list because almost all its edges
    * point INTO it. Same count either way (invariance spec'd); the
    * default stays id-based so the oracle SQL matches line for line.
    * Returns one row: (n_vertices, n_edges, n_triangles).
    *
    * Adjacency routing (round 16): the edge count — REQUIRED OUTPUT
    * anyway — is taken eagerly on the pinned edge RDD and routes the
    * two intersection joins. Adjacency bytes ≈ 56 × edges: the raw
    * payload is one 8-byte array cell per edge, but the DESERIALIZED
    * broadcast (UnsafeRow per vertex + array headers + the
    * HashedRelation's table and object overhead) runs several times
    * the raw bytes — the estimate is derated so a graph that passes
    * the budget check still fits executor/driver memory once
    * hydrated, not just on the wire. Below
    * `broadcastBudgetBytes` the PINNED adjacency is broadcast to both
    * joins (the groupBy runs once at pin time; the builds read
    * checkpoint bytes), deleting every probe-side exchange
    * and sort. Above the budget — the 100 TB regime — the edge pin
    * re-partitions on u ([[pinEdges]] route), making the adjacency
    * groupBy and the u-side SMJ exchange-free while the v-side probe
    * pays the one unavoidable exchange. A caller-declared
    * `vertexCount` above [[largeVertexState]] forces the scale route
    * regardless of the measured count (the census is authoritative
    * when the caller says the graph is huge — e.g. a sampled edge
    * frame standing in for the full one).
    */
  def triangleStats(edges: DataFrame, orientByDegree: Boolean = false,
      vertexCount: Option[Long] = None,
      broadcastBudgetBytes: Long = 256L << 20): DataFrame = {
    // the edge list feeds four consumers (vertex count, edge count,
    // adjacency build, intersection probe) — pin it once or the
    // upstream build (a groupBy + pair expansion) re-executes per
    // consumer. Pin plain first: the route is count-derived, and the
    // count needs the pin.
    val (e0, nEdges) = Pinned.pinWithCount(edges.select(col("u"), col("v")))
    val forcedLarge = vertexCount.exists(largeVertexState(edges.sparkSession, _))
    val bcast = !forcedLarge && nEdges * 56L <= broadcastBudgetBytes
    // on the scale route, re-pin co-partitioned on u (one exchange
    // over checkpoint bytes) so the adjacency groupBy AND the u-side
    // probe join read it exchange-free
    val e1 = if (bcast) e0 else pinEdges(e0, "u", coPartition = true)
    val e =
      if (!orientByDegree) e1
      else {
        // undirected degree per endpoint; the (degree, id) total order
        // picks each edge's arrow direction
        val deg = e1.select(col("u").as("x")).union(e1.select(col("v").as("x")))
          .groupBy("x").agg(count(lit(1)).as("d"))
        val fwd = col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v"))
        e1.join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
          .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
          .select(
            when(fwd, col("u")).otherwise(col("v")).as("u"),
            when(fwd, col("v")).otherwise(col("u")).as("v"))
          // the oriented list feeds adjacency build + probe; its
          // lineage is two joins over e1 — pin it like e1 rather than
          // re-running them per consumer (same route as e1's pin)
          .transform((d: DataFrame) => pinEdges(d, "u", !bcast))
      }
    val verts = e.select(col("u").as("x")).union(e.select(col("v").as("x"))).distinct()
    val tris =
      if (bcast) {
        // pin the adjacency (built once) and broadcast it to BOTH
        // joins: the groupBy runs exactly once (the pin), and each
        // broadcast build reads the checkpoint bytes — AQE's stage
        // reuse dedupes the two builds when it canonicalizes the
        // re-aliased LogicalRDD scans to the same RDD; even unreused,
        // a duplicate build re-collects budget-bounded bytes, never
        // re-runs the aggregation
        val adjP = Pinned.pin(e.groupBy(col("u").as("x"))
          .agg(sort_array(collect_list(col("v"))).as("nbr")))
        val t = e
          .join(broadcast(adjP), col("u") === col("x"))
          .select(col("u"), col("v"), col("nbr").as("nu"))
          .join(broadcast(adjP), col("v") === col("x"), "left")
          .select(when(col("nbr").isNull, lit(0L))
            .otherwise(size(array_intersect(col("nu"), col("nbr"))).cast("long")).as("t"))
          .agg(coalesce(sum("t"), lit(0L)).as("n_triangles"))
        (adjP, t)
      } else {
        val adj = e.groupBy(col("u").as("x"))
          .agg(sort_array(collect_list(col("v"))).as("nbr"))
        val t = e
          .join(adj.select(col("x").as("u"), col("nbr").as("nu")), Seq("u"))
          .join(adj.select(col("x").as("v"), col("nbr").as("nv")), Seq("v"), "left")
          .select(when(col("nv").isNull, lit(0L))
            .otherwise(size(array_intersect(col("nu"), col("nv"))).cast("long")).as("t"))
          .agg(coalesce(sum("t"), lit(0L)).as("n_triangles"))
        (null, t)
      }
    // the result is ONE row: eager-checkpoint it (bytes) so the edge
    // and adjacency pins can be released before returning instead of
    // leaking until the ContextCleaner notices; the edge count rides
    // in as the literal the route already paid for
    val out = verts.agg(count(lit(1)).as("n_vertices"))
      .withColumn("n_edges", lit(nEdges))
      .crossJoin(tris._2)
      .transform(graft.ops.Pinned.pin)
    if (tris._1 != null) Pinned.release(tris._1)
    if (!(e eq e1)) Pinned.release(e)
    if (!(e1 eq e0)) Pinned.release(e1)
    Pinned.release(e0)
    out
  }

  /** 2-hop reach per vertex over a SYMMETRIZED, DISTINCT (u, v) edge
    * list: (u, n_one_hop, n_two_hop) where n_two_hop counts vertices
    * reachable in exactly two hops (not u, not a direct neighbor).
    * The wedge volume Σ deg² is the semantics — what routes is HOW
    * it moves:
    *
    *  - gather form (default): build the per-vertex sorted neighbor
    *    set once, join each edge (u,v) to N(v), gather per u with
    *    ONE aggregation, and run dedup + 1-hop/self exclusion as
    *    array ops inside codegen — the wedge volume moves once as
    *    array cells instead of twice as shuffled rows (6.3 s -> 2.8 s
    *    at sf0.1, SCALE.md round-13). Its boundary: a hub u gathers
    *    Σ_{v∈N(u)} deg(v) <= maxDeg² cells into one aggregation
    *    buffer, and AQE can split skewed ROWS but never a single
    *    array — a social-graph hub with 10^6-degree neighbors would
    *    overwhelm the buffer.
    *  - row form (the route above the boundary): materialize wedge
    *    (u, w) rows, DISTINCT, anti-join the 1-hop edges, count —
    *    two extra data-sized shuffles, but every stage is row-shaped
    *    and AQE skew-splits it.
    *
    * Routing discipline as [[largeVertexState]]: the caller passes
    * the degree census it already has (max degree lives in table
    * stats at lakehouse scale); the gather route is taken while the
    * worst-case hub buffer maxDeg² × 8 bytes fits `gatherBufferBytes`
    * (default 256 MiB — a fraction of a production executor's task
    * memory, so the boundary errs toward the splittable form).
    * Both routes are bit-identical (GraphRoutingSpec).
    */
  def twoHopReach(sym: DataFrame, maxDegree: Option[Long] = None,
      gatherBufferBytes: Long = 256L << 20): DataFrame = {
    val hubUnsafe = maxDegree.exists(d =>
      d > 0 && (d > (1L << 30) || d * d > gatherBufferBytes / 8))
    if (hubUnsafe) twoHopRows(sym) else twoHopGather(sym)
  }

  /** [[twoHopReach]]'s gather form — see the routing scaladoc. */
  private[ops] def twoHopGather(sym: DataFrame): DataFrame = {
    val adj = sym.groupBy(col("u").as("x"))
      .agg(sort_array(collect_set(col("v"))).as("nbr"))
    val gathered = sym
      .join(adj.select(col("x").as("v"), col("nbr").as("nv")), Seq("v"))
      .groupBy("u").agg(flatten(collect_list(col("nv"))).as("allw"))
    adj.select(col("x").as("u"), col("nbr").as("nu"))
      .join(gathered, Seq("u"), "left")
      .select(col("u"),
        size(col("nu")).cast("long").as("n_one_hop"),
        coalesce(
          size(array_except(array_distinct(col("allw")),
            array_union(col("nu"), array(col("u"))))).cast("long"),
          lit(0L)).as("n_two_hop"))
  }

  /** [[twoHopReach]]'s row form — wedge rows, DISTINCT, 1-hop
    * anti-join; AQE-splittable at every stage. */
  private[ops] def twoHopRows(sym: DataFrame): DataFrame = {
    val wedges = sym.select(col("u"), col("v").as("m"))
      .join(sym.select(col("u").as("m"), col("v").as("w")), Seq("m"))
      .filter(col("u") =!= col("w"))
      .select("u", "w").distinct()
    val two = wedges
      .join(sym.select(col("u"), col("v").as("w")), Seq("u", "w"), "left_anti")
      .groupBy("u").agg(count(lit(1)).as("n_two_hop"))
    sym.groupBy("u").agg(count(lit(1)).as("n_one_hop"))
      .join(two, Seq("u"), "left")
      .select(col("u"), col("n_one_hop"),
        coalesce(col("n_two_hop"), lit(0L)).as("n_two_hop"))
  }

  /** PageRank in 64-bit integer fixed-point, `iters` rounds.
    *
    * Total mass `scale` is split evenly (integer div) as the start
    * vector; each round every node sends `pr div degree` along each
    * out-edge and the new rank is
    * `(15 * (scale div n) + 85 * inflow) div 100` — the standard
    * 0.85-damped update with every operation an exact integer op.
    * Integer division leaks the remainder (mass shrinks by < n*100
    * units of 1/scale per round — for scale 1e12 that is noise), and
    * buys full determinism: no double summation order, no libm, same
    * bits on any engine and any partitioning.
    *
    * Shuffle shape per round: one join of the rank table to the edge
    * list on src (both hash-partitioned by node key) + one groupBy
    * dst — the Pregel superstep. The rank table is (node, long), tiny
    * relative to edges; at cluster scale you'd co-partition the edge
    * list once and reuse the exchange every round.
    *
    * Expects a SYMMETRIZED edge list for undirected graphs. Every
    * node is assumed to have degree >= 1 (true for co-occurrence
    * edges); dangling mass handling is not modeled.
    */
  def pageRankFixedPoint(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L,
      vertexCount: Option[Long] = None): DataFrame =
    pageRankPinned(edges, iters, scale,
      vertexCount.exists(largeVertexState(edges.sparkSession, _)), "src")

  /** [[pageRankFixedPoint]] with the route and pin key explicit —
    * the spec's A/B hook. Pin key A/B (round-15, GraphRoutingSpec):
    * src — the per-round JOIN key — beats dst above the broadcast
    * threshold, same asymmetry as LPA's: the inflow aggregate's
    * input is the JOIN OUTPUT, which no edge pin can pre-cluster on
    * dst, so a dst pin saves nothing per round while forcing the
    * full edge list to re-shuffle to src for every superstep's
    * rank join; the src pin deletes that edge-side exchange from
    * every round and concedes the (partial-agg-reduced) inflow
    * exchange — the unavoidable one. The degree groupBy rides the
    * src pin for free.
    *
    * Round-15 restructure: the rank frame now carries (node, deg,
    * pr) with the vertex count folded in as a LITERAL (one eager
    * node-sized count against the pinned edges) and each round
    * joins the STATIC pinned degree frame to the fresh inflow —
    * the old form threaded `pr` through BOTH the contribution
    * projection and the next-rank join, doubling the rank
    * lineage per round (2^iters subplan copies that only
    * ReuseExchange clawed back); this chain reads each round's
    * frame exactly once, so no per-round checkpoint is needed at
    * all (A/B'd: per-round pins cost 0.3-0.5 s at sf0.1). Every
    * arithmetic op stays exact 64-bit integer — bit-identical to
    * the two-round oracle SQL.
    */
  private[ops] def pageRankPinned(edges: DataFrame, iters: Int,
      scale: Long, route: Boolean, pinKey: String): DataFrame = {
    // pinned: the edge list is re-joined every superstep (and its
    // upstream is typically a basket expansion) — at cluster scale
    // this is the cached, pre-partitioned edge RDD every Pregel
    // system keeps.
    val e = pinEdges(edges.select(col("src"), col("dst")), pinKey, route)
    // the vertex count is an iteration CONSTANT — folded into the
    // round expressions as a literal (the bounded-scalar pattern
    // `Ranks` uses for offsets; the old crossJoin(n) carried it as a
    // column through every round). Round 18: the count rides the
    // pin's own materializing job ([[Pinned.pinWithCount]]) — one
    // barrier where round 16's backing-RDD count was a second.
    val (deg, n) = Pinned.pinWithCount(
      e.groupBy("src").agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")))
    if (n == 0) {
      // empty edge list: no vertices, no ranks — return an empty
      // (node, pr) frame instead of dividing by zero below (the old
      // lazy crossJoin form returned empty here too)
      val nodeT = deg.schema("node").dataType
      Pinned.release(e); Pinned.release(deg)
      return edges.sparkSession.createDataFrame(
        edges.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", nodeT),
          org.apache.spark.sql.types.StructField("pr",
            org.apache.spark.sql.types.LongType))))
    }
    val tele = 15L * (scale / n) // 15 * (scale div n), exact
    var pr = deg.withColumn("pr", lit(scale / n))
    for (_ <- 1 to iters) {
      val contrib = pr.select(col("node").as("src"), expr("pr div deg").as("c"))
      val inflow = e.join(contrib, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("inflow"))
      // left join + coalesce: a node with no in-edges still holds its
      // teleport share (cannot happen on symmetrized edges, but the
      // operator shouldn't silently drop rows on directed input)
      pr = deg.join(inflow, Seq("node"), "left")
        .select(col("node"), col("deg"),
          expr(s"(${tele}L + 85 * coalesce(inflow, 0L)) div 100").as("pr"))
    }
    // eager-checkpoint the final ranks (node-sized) so the edge and
    // degree pins can be released before returning; the result
    // checkpoint itself is caller-owned ([[Pinned]])
    val out = pr.select(col("node"), col("pr")).transform(graft.ops.Pinned.pin)
    Pinned.release(e); Pinned.release(deg)
    out
  }

  /** Synchronous majority label propagation, `rounds` supersteps,
    * over a SYMMETRIZED (src, dst) edge list — community detection
    * as the Pregel superstep. Labels start as node ids; each round
    * every node takes its neighbors' most frequent label (ties to
    * the smallest label — `mode(deterministic = true)` picks the
    * lowest value among equally-frequent ones, never a sampled
    * tie-break). Returns (node, label).
    *
    * Superstep shape (round 15 — was a two-level groupBy): one
    * edges-to-labels equi-join on dst + ONE `mode` aggregate per
    * src. The old form counted per (src, label) then argmax'd per
    * src — two exchanges per round, because HashPartitioning(src,
    * label) does not satisfy the second groupBy's
    * ClusteredDistribution(src); the mode aggregate folds count and
    * argmax into one map-side-combinable pass (per-partition
    * label-count maps merge across the single src exchange). Round
    * 1 needs NO join at all: labels start as node ids, so joining
    * l0 on dst just relabels the edge's dst column — the superstep
    * collapses to `groupBy(src).agg(mode(dst))`. The per-round
    * nodes left-join is gone too: on a symmetrized edge list every
    * node appears as src, so the aggregate output IS the full label
    * frame (4.3 s -> 1.5 s at sf0.1, bit-identical, A/B'd against
    * the two-level form). Each round's label frame is pinned (the
    * next round joins it) and released when its successor
    * materializes; only the FINAL frame stays pinned, caller-owned
    * ([[Pinned]]). Routing as the other iterative ops: pass
    * `vertexCount` and the edge pin pre-partitions on dst once the
    * label frame outgrows broadcast ([[largeVertexState]]).
    *
    * Pin key A/B (round-15, GraphRoutingSpec): dst — the per-round
    * JOIN key — beats src above the broadcast threshold. The src
    * candidate (the aggregate key) saves only round 1's aggregate
    * exchange, because the per-round aggregate input is the JOIN
    * OUTPUT (dst-partitioned after the SMJ), which a src-pinned
    * edge list cannot make src-clustered; meanwhile every round
    * >= 2 would re-shuffle the full edge list to dst for the join.
    * A dst pin deletes that edge-side exchange from every joining
    * round and concedes one node-frame-sized aggregate exchange per
    * round — the unavoidable one.
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
      vertexCount: Option[Long] = None): DataFrame =
    labelPropagationPinned(edges, rounds,
      vertexCount.exists(largeVertexState(edges.sparkSession, _)), "dst")

  /** [[labelPropagation]] with the route and pin key explicit — the
    * spec's A/B hook (exchange counts per key, bit-identity across
    * keys and routes). Production callers use the public form. */
  private[ops] def labelPropagationPinned(edges: DataFrame, rounds: Int,
      route: Boolean, pinKey: String): DataFrame = {
    require(rounds >= 1, s"labelPropagation needs >= 1 round, got $rounds")
    val sym = pinEdges(edges.select(col("src"), col("dst")), pinKey, route)
    // round 1: l0.label == node, so the join on dst collapses away
    var l = sym.groupBy(col("src").as("node"))
      .agg(mode(col("dst"), deterministic = true).as("label"))
      .transform(Pinned.pin)
    var prev = l
    for (_ <- 2 to rounds) {
      l = sym.join(l.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("node"))
        .agg(mode(col("label"), deterministic = true).as("label"))
        .transform(Pinned.pin)
      Pinned.release(prev)
      prev = l
    }
    Pinned.release(sym)
    l
  }
}
