package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Invariants of the round-9 corpus-learning queries that the hash
  * oracle verifies only implicitly: BPE compression monotonicity,
  * label-propagation bookkeeping, hard-negative ordering, gradient
  * algebra, and OOV-curve monotonicity.
  */
class LearningOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q281: each BPE merge strictly shrinks the corpus token count") {
    val rows = SparkEntry.queries("q281_bpe_merges")(spark, sf)
      .orderBy("round").collect()
    assert(rows.length === 3)
    val toks = rows.map(_.getAs[Long]("tokens_after"))
    assert(toks(0) > toks(1) && toks(1) > toks(2),
      s"tokens_after must strictly decrease: ${toks.mkString(",")}")
    // a merge saves exactly cnt tokens ONLY if no adjacent repeats
    // deferred — so the bound is: savings <= cnt, savings > 0
    rows.foreach { r =>
      val pair = r.getAs[String]("pair")
      assert(pair.split(" ").length === 2, s"pair must be two symbols: '$pair'")
      assert(r.getAs[Long]("cnt") > 0L)
    }
  }

  test("q282: community sizes are sane and deterministic") {
    val q = SparkEntry.queries("q282_label_propagation")
    val a = q(spark, sf).collect()
    val b = q(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "label propagation must be deterministic")
    assert(a.nonEmpty)
    val sizes = a.map(_.getAs[Long]("size"))
    assert(sizes.sameElements(sizes.sortBy(-_)), "sizes must be descending")
    a.foreach { r =>
      assert(r.getAs[Long]("min_node") <= r.getAs[Long]("max_node"))
      assert(r.getAs[Long]("size") >= 1L)
    }
  }

  test("q283: hard negatives cross labels, ranks contiguous, cos ordered") {
    val rows = SparkEntry.queries("q283_hard_negatives")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") % 7 === 0L, "anchors are the 1-in-7 sample")
      assert(r.getAs[Int]("a_label") !== r.getAs[Int]("c_label"),
        "a hard NEGATIVE must carry a different label")
      val cos = r.getAs[Double]("cos")
      assert(cos >= -1.0001 && cos <= 1.0001)
    }
    rows.groupBy(_.getAs[Long]("a_id")).foreach { case (a, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq === (1 to rs.length),
        s"ranks for anchor $a must be contiguous from 1")
      val coss = byRank.map(_.getAs[Double]("cos"))
      assert(coss.zip(coss.tail).forall { case (x, y) => x >= y },
        s"cos must be non-increasing with rank for anchor $a")
    }
  }

  test("q284: weight algebra matches the quantized gradients exactly") {
    val rows = SparkEntry.queries("q284_lr_train")(spark, sf)
      .orderBy("f").collect()
    assert(rows.length === 8)
    val n = rows.head.getAs[Long]("n_docs")
    rows.foreach { r =>
      val g1 = r.getAs[Long]("g1"); val w1 = r.getAs[Double]("w1")
      val g2 = r.getAs[Long]("g2"); val w2 = r.getAs[Double]("w2")
      assert(w1 === g1.toDouble * 0.1 / (n.toDouble * 1048576.0),
        s"w1 must be the exact scaled gradient for f=${r.getAs[Int]("f")}")
      assert(w2 === w1 + g2.toDouble * 0.1 / (n.toDouble * 1048576.0))
      assert(!w1.isNaN && !w2.isNaN)
    }
    val correct = rows.head.getAs[Long]("n_correct1")
    assert(correct >= 0L && correct <= n)
    // step 2 must actually move at least one weight (zero movement
    // would mean every residual quantized to zero — not learning)
    assert(rows.exists(r => r.getAs[Double]("w2") !== r.getAs[Double]("w1")))
  }

  test("q286: the LSH S-curve trades recall for precision as rows/band grow") {
    val rows = SparkEntry.queries("q286_lsh_tradeoff")(spark, sf)
      .orderBy("rows_per_band").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits <= r.getAs[Long]("n_candidates"))
      assert(hits <= r.getAs[Long]("n_truth"))
    }
    val prec = rows.map(r => Option(r.getAs[java.lang.Double]("precision"))
      .map(_.doubleValue).getOrElse(1.0))
    val rec = rows.map(r => Option(r.getAs[java.lang.Double]("recall"))
      .map(_.doubleValue).getOrElse(0.0))
    assert(prec.zip(prec.tail).forall { case (a, b) => b >= a },
      s"precision must not fall as bands narrow: ${prec.mkString(",")}")
    assert(rec.zip(rec.tail).forall { case (a, b) => b <= a },
      s"recall must not rise as bands narrow: ${rec.mkString(",")}")
  }

  test("q287: contamination matrix covers every source pair with sane bounds") {
    val rows = SparkEntry.queries("q287_contamination_matrix")(spark, sf).collect()
    val nSrc = (1 + Math.sqrt(1 + 8.0 * rows.length)) / 2
    assert(nSrc === Math.rint(nSrc), "row count must be C(n,2) for n sources")
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      val j = r.getAs[Double]("jaccard")
      assert(c >= 0.0 && c <= 1.0)
      assert(j >= 0.0 && j <= c + 1e-12, "jaccard can never exceed containment")
      assert(r.getAs[Long]("n_common") <=
        math.min(r.getAs[Long]("n1"), r.getAs[Long]("n2")))
      assert(r.getAs[String]("src1") < r.getAs[String]("src2"))
    }
  }

  test("q288: chi2 is non-negative and the drift flag matches the threshold") {
    val q = SparkEntry.queries("q288_drift_chi2")
    val a = q(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val chi2 = r.getAs[Double]("chi2")
      assert(chi2 >= 0.0)
      assert(r.getAs[Boolean]("drifted") === (chi2 > 16.919))
      assert(r.getAs[Long]("n_ref") > 0L && r.getAs[Long]("n_cur") > 0L)
    }
    assert(a.toSeq === q(spark, sf).collect().toSeq, "must be deterministic")
  }

  test("q289: one-pass dispersion matches brute-force pairwise distance") {
    val rows = SparkEntry.queries("q289_embedding_dispersion")(spark, sf)
      .orderBy("label").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Cauchy-Schwarz: E||x||^2 >= ||E x||^2, up to quantization slop
      assert(r.getAs[Double]("dispersion") >= -1e-4)
      assert(r.getAs[Double]("m_norm2") >= -1e-4)
    }
    // brute-force the identity for one label: the mean over ALL
    // ordered pairs (i, j) of ||xi - xj||^2 must equal 2*(E - M)
    val label = rows.head.getAs[Int]("label")
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("label") === label)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val n = vecs.length
    var tot = 0.0
    for (a <- vecs; b <- vecs)
      tot += a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val brute = tot / (n.toDouble * n.toDouble)
    val reported = rows.head.getAs[Double]("dispersion")
    assert(math.abs(brute - reported) < 1e-3,
      s"identity violated: brute=$brute reported=$reported")
  }

  test("q285: OOV rate is non-increasing in vocab size and exact at the cap") {
    val rows = SparkEntry.queries("q285_oov_curve")(spark, sf)
      .orderBy("vocab_size").collect()
    assert(rows.length === 3)
    val rates = rows.map(_.getAs[Double]("oov_rate"))
    assert(rates.zip(rates.tail).forall { case (a, b) => a >= b },
      s"oov must not grow with vocab: ${rates.mkString(",")}")
    rows.foreach { r =>
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("total"))
      val nd = r.getAs[Long]("n_distinct")
      if (r.getAs[Int]("vocab_size") >= nd)
        assert(r.getAs[Double]("oov_rate") === 0.0,
          "a vocab covering every distinct word has zero OOV")
    }
  }
}
