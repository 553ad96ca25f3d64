package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of parallel vectors is 1, orthogonal 0, antiparallel -1") {
    val df = Seq((
      Array(1.0f, 0.0f), Array(2.0f, 0.0f), Array(0.0f, 3.0f), Array(-1.0f, 0.0f)))
      .toDF("a", "b", "c", "d")
    def cos(x: String, y: String) =
      Similarity.cosine(Similarity.asDouble(col(x)), Similarity.asDouble(col(y)))
    val r = df.select(cos("a", "b"), cos("a", "c"), cos("a", "d")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
  }

  test("cosine with a zero-norm vector is null, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("z", "v")
    val r = df.select(
      Similarity.cosine(Similarity.asDouble(col("z")), Similarity.asDouble(col("v")))).head()
    assert(r.isNullAt(0))
  }

  test("bruteForceTopK returns the k nearest, ties broken by id") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, queryVecId = 0L, k = 2).collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(3L, 1L)) // exact match first
  }

  test("native cosine_sim is bit-identical to the composed-builtin cosine") {
    val vecs = Seq(
      (Array(0.3f, -1.2f, 0.8f, 0.05f), Array(0.31f, -1.1f, 0.75f, 0.0f)),
      (Array(1e-8f, 2e-8f, 0f, 0f), Array(5f, -3f, 2f, 1f)),
      (Array(0f, 0f, 0f, 0f), Array(1f, 1f, 1f, 1f))).toDF("a", "b")
    val r = vecs.select(
      graft.functions.VectorExprs.cosineSim(col("a"), col("b")).as("native"),
      Similarity.cosine(Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))).as("composed"))
      .collect()
    r.foreach { row =>
      if (row.isNullAt(0) || row.isNullAt(1)) assert(row.isNullAt(0) === row.isNullAt(1))
      else assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
    }
  }

  test("signBucket maps sign pattern of leading dims") {
    val df = Seq(Tuple1(Array(0.5f, -0.2f, 0.1f))).toDF("v")
    val b = df.select(Similarity.signBucket(col("v"), 3)).head().getString(0)
    assert(b === "101")
  }

  test("hardNegatives excludes same-label rows; more bits only shrink candidates") {
    val emb = Seq(
      (0L, 0, Array(1.0f, 1.0f, 1.0f, 1.0f)),    // anchor (id % 7 == 0)
      (1L, 0, Array(0.99f, 0.99f, 1.0f, 1.0f)),  // same label — excluded
      (2L, 1, Array(0.9f, 1.0f, 1.0f, 1.0f)),    // cross-label, bucket 1111
      (3L, 2, Array(1.0f, 0.8f, 1.0f, -0.1f)),   // bucket 1110: bits=4 prunes
      (4L, 3, Array(-1.0f, 1.0f, 1.0f, 1.0f))    // bucket 0...: never a cand
    ).toDF("vec_id", "label", "embedding")
    val pred = col("vec_id") % 7 === 0
    val wide = Similarity.hardNegatives(emb, pred, k = 10, bits = 1).collect()
    val narrow = Similarity.hardNegatives(emb, pred, k = 10, bits = 4).collect()
    assert(wide.forall(r => r.getAs[Int]("a_label") != r.getAs[Int]("c_label")))
    assert(wide.forall(_.getAs[Long]("c_id") !== 1L))
    val wideIds = wide.map(_.getAs[Long]("c_id")).toSet
    val narrowIds = narrow.map(_.getAs[Long]("c_id")).toSet
    assert(narrowIds.subsetOf(wideIds),
      "a finer quantizer must never invent candidates")
    assert(wideIds === Set(2L, 3L) && narrowIds === Set(2L),
      "bits=1 keeps the last-dim-negative vector; bits=4 prunes it")
  }

  test("annTopKInBucket only searches the query's bucket") {
    val emb = Seq(
      (0L, Array(1.0f, 1.0f)),  // bucket 11
      (1L, Array(0.9f, 0.9f)),  // bucket 11 — candidate
      (2L, Array(-1.0f, 1.0f)) // bucket 01 — not scanned
    ).toDF("vec_id", "embedding")
    val res = Similarity.annTopKInBucket(emb, queryVecId = 0L, k = 5, bits = 2).collect()
    assert(res.map(_.getLong(0)).toSeq === Seq(1L))
  }
}
