package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: code validity, reconstruction optimality
  * (each assigned centroid is the true per-subspace argmin), ADC
  * self-consistency, and the broadcast-only plan shape.
  */
class PqSpec extends SparkSpec {

  private val m = 4
  private val ds = 4 // 16-dim toy vectors
  private val k = 4

  private lazy val emb = {
    import spark.implicits._
    // deterministic pseudo-random floats: vec_id i, dim t →
    // fract(sin-free integer hash scaled into [-1, 1)
    (0L until 40L).map { i =>
      val v = (0 until m * ds).map { t =>
        val h = (i * 1315423911L + t * 2654435761L) & 0xffffL
        (h.toFloat / 32768f) - 1f
      }.toArray
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  test("codes are in range and complete: one code per (vector, subspace)") {
    val enc = Pq.encode(emb, m, ds, k).collect()
    assert(enc.length == 40 * m)
    assert(enc.forall { r =>
      val c = r.getAs[Long]("code"); c >= 0 && c < k
    })
    val perVec = enc.groupBy(_.getAs[Long]("vec_id")).view.mapValues(_.map(_.getAs[Int]("j")).sorted.toSeq)
    assert(perVec.values.forall(_ == (0 until m)))
  }

  test("each code is the true argmin over the codebook") {
    val sub = Pq.subvectors(emb, m, ds).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("j")) -> r.getSeq[Double](r.fieldIndex("sv"))).toMap
    def d2(a: scala.collection.Seq[Double], b: scala.collection.Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val enc = Pq.encode(emb, m, ds, k).collect()
    enc.foreach { r =>
      val (v, j, c) = (r.getAs[Long]("vec_id"), r.getAs[Int]("j"), r.getAs[Long]("code"))
      val mine = d2(sub((v, j)), sub((c, j)))
      (0L until k.toLong).foreach { other =>
        assert(mine <= d2(sub((v, j)), sub((other, j))) + 1e-12,
          s"vec $v subspace $j: code $c beaten by $other")
      }
    }
  }

  test("ADC distance equals sum of per-subspace squared distances to assigned centroids") {
    val sub = Pq.subvectors(emb, m, ds).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("j")) -> r.getSeq[Double](r.fieldIndex("sv"))).toMap
    def d2(a: scala.collection.Seq[Double], b: scala.collection.Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val enc = Pq.encode(emb, m, ds, k).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("j")) -> r.getAs[Long]("code")).toMap
    val top = Pq.adcTopK(emb, m, ds, k, queryVecId = 0L, topK = 5).collect()
    assert(top.length == 5)
    top.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      val expected = (0 until m).map(j => d2(sub((0L, j)), sub((enc((v, j)), j)))).sum
      assert(math.abs(r.getAs[Double]("adc_d2") - expected) < 1e-9)
    }
    // ascending
    val ds2 = top.map(_.getAs[Double]("adc_d2")).toSeq
    assert(ds2 == ds2.sorted)
  }

  test("IVF-PQ candidates come only from the query's probed cells") {
    def d2(a: scala.collection.Seq[Double], b: scala.collection.Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val full = Pq.subvectors(emb, 1, m * ds).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](r.fieldIndex("sv"))).toMap
    val nlist = 4
    val base = 4L
    val probed = (0 until nlist)
      .map(c => (d2(full(0L), full(base + c)), c.toLong)).sorted.take(2)
      .map(_._2).toSet
    val asg = Pq.coarseAssign(emb, nlist, base).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    // every vector's cell is the true full-vector argmin
    asg.foreach { case (v, cell) =>
      val mine = d2(full(v), full(base + cell))
      (0L until nlist.toLong).foreach(o =>
        assert(mine <= d2(full(v), full(base + o)) + 1e-12))
    }
    val top = Pq.ivfAdcTopK(emb, m, ds, k, nlist, base, queryVecId = 0L,
      nprobe = 2, topK = 5).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val (v, cell) = (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))
      assert(v >= base + nlist, "codebook/centroid ids must not be candidates")
      assert(cell === asg(v), "reported cell must be the vector's own")
      assert(probed.contains(cell), s"candidate from unprobed cell $cell")
    }
    val adcs = top.map(_.getAs[Double]("adc_d2")).toSeq
    assert(adcs == adcs.sorted)
  }

  test("encode plan broadcasts the codebook — no corpus-side shuffle before the argmin") {
    val plan = Pq.encode(emb, m, ds, k).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in:\n$plan")
  }
}
