package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q263 duplicated-span invariants on a hand-built corpus where the
  * ground truth is known exactly.
  */
class DupSpansSpec extends SparkSpec {

  // Two docs share a 12-token run (→ one maximal span of 5 windows,
  // tokens 1..12 in doc A, 4..15 in doc B); doc C is all-unique; doc
  // D shares an 8-token run with A at its tail (exactly one window).
  private val shared12 = (1 to 12).map(i => s"s$i").mkString(" ")
  private val shared8 = (1 to 8).map(i => s"t$i").mkString(" ")
  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, shared12 + " ax1 ax2 ax3 " + shared8),
      (1L, "bx1 bx2 bx3 " + shared12 + " bx4"),
      (2L, (1 to 20).map(i => s"c$i").mkString(" ")),
      (3L, "dx1 dx2 " + shared8)
    ).toDF("doc_id", "text")
  }

  private def spans = {
    val dir = java.nio.file.Files.createTempDirectory("dupspans").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("q263_dup_spans")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("n_windows"), r.getAs[Long]("span_len")))
  }

  test("finds exactly the planted maximal spans") {
    val got = spans.toSet
    // doc 0: 12-token shared run = windows 1..5 → span [1,12]; the
    // 8-token tail shared with doc 3 = 1 window at start 16 → [16,23]
    // doc 1: same 12-token run at offset 4 → windows 4..8 → [4,15]
    // doc 3: window 3 → [3,10]; doc 2: nothing
    assert(got == Set(
      (0L, 1L, 12L, 5L, 12L),
      (0L, 16L, 23L, 1L, 8L),
      (1L, 4L, 15L, 5L, 12L),
      (3L, 3L, 10L, 1L, 8L)))
  }

  test("spans are disjoint per doc and at least one window wide") {
    val byDoc = spans.groupBy(_._1)
    byDoc.values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _, _), (_, s2, _, _, _)) => assert(e1 < s2)
        case _ =>
      }
      sorted.foreach { case (_, s, e, nw, len) =>
        assert(len == e - s + 1); assert(len == nw + 7); assert(len >= 8)
      }
    }
  }
}
