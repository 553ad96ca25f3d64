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

  /** Undirected co-occurrence edges: items sharing a group key.
    *
    * One self-join per group key — the shuffle is by `groupCol`, and
    * the pair expansion is bounded by the per-group item count (order
    * baskets are small and bounded by the business domain, unlike the
    * global item count). Emits each edge once as (u, v) with u < v.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val m = df.select(col(groupCol).as("__g"), col(itemCol).as("__i")).distinct()
    m.as("a").join(m.as("b"),
        col("a.__g") === col("b.__g") && col("a.__i") < col("b.__i"))
      .select(col("a.__i").as("u"), col("b.__i").as("v"))
      .distinct()
  }

  /** Triangle count over an oriented (u < v) edge list.
    *
    * The classic two-join motif count: wedges from e1.v = e2.u, closed
    * by probing the edge list for (a, c). Orienting edges low-id →
    * high-id counts each triangle exactly once and caps wedge fan-out
    * at the oriented out-degree; production systems orient by DEGREE
    * instead (high-degree vertices get few out-edges), which bounds
    * the wedge count at O(E^1.5) regardless of skew — noted here
    * because the id orientation keeps the oracle SQL identical.
    * Returns one row: (n_vertices, n_edges, n_triangles).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    val verts = e.select(col("u").as("x")).union(e.select(col("v").as("x"))).distinct()
    val wedges = e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val tris = wedges.join(e.as("e3"), col("a") === col("e3.u") && col("c") === col("e3.v"))
    verts.agg(count(lit(1)).as("n_vertices"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tris.agg(count(lit(1)).as("n_triangles")))
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
  def pageRankFixedPoint(edges: DataFrame, iters: Int, scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node"), col("deg"))
    val n = nodes.agg(count(lit(1)).as("n"))
    val base = nodes.crossJoin(n)
      .select(col("node"), col("deg"), expr(s"${scale}L div n").as("pr0"), col("n"))

    var pr = base.select(col("node"), col("deg"), col("pr0").as("pr"), col("n"))
    for (_ <- 1 to iters) {
      val contrib = pr.select(col("node").as("src"), expr("pr div deg").as("c"))
      val inflow = e.join(contrib, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("inflow"))
      // left join + coalesce: a node with no in-edges still holds its
      // teleport share (cannot happen on symmetrized edges, but the
      // operator shouldn't silently drop rows on directed input)
      pr = pr.drop("pr").join(inflow, Seq("node"), "left")
        .withColumn("inflow", coalesce(col("inflow"), lit(0L)))
        .select(col("node"), col("deg"),
          expr(s"(15 * (${scale}L div n) + 85 * inflow) div 100").as("pr"), col("n"))
    }
    pr.select(col("node"), col("pr"))
  }
}
