package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-prefiltered decontamination is identical to the exact join") {
    // corpus docs 1..40, every 7th doc shares a 3-gram run with bench doc 100
    val mk = (id: Long) =>
      if (id % 7 == 0) s"leak alpha beta gamma tail$id"
      else s"doc$id one two three four five"
    val corpus = (1L to 40L).map(id => (id, mk(id))).toDF("doc_id", "text")
    val bench = Seq((100L, "leak alpha beta gamma")).toDF("doc_id", "text")

    val exact = Corpus.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Corpus.decontaminateBloom(corpus, bench, "doc_id", "text", n = 3,
        expectedGrams = 1000L, fpp = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(exact.nonEmpty) // docs 7,14,21,28,35 leak
    assert(bloom === exact)
  }

  test("bloom prefilter keeps zero-overlap corpora empty") {
    val corpus = (1L to 20L).map(id => (id, s"clean$id words only here")).toDF("doc_id", "text")
    val bench = Seq((100L, "totally different bench text")).toDF("doc_id", "text")
    assert(Corpus.decontaminateBloom(corpus, bench, "doc_id", "text", 3, 100L, 0.01)
      .collect().isEmpty)
  }
}
