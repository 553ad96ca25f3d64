package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("tokenCount counts whitespace tokens") {
    assert(one(TextStats.tokenCount(col("text")), "a b c") === 3L)
    assert(one(TextStats.tokenCount(col("text")), "single") === 1L)
  }

  test("stopwordCount counts exact stopword tokens") {
    assert(one(TextStats.stopwordCount(col("text")), "the cat and the hat") === 3L)
    assert(one(TextStats.stopwordCount(col("text")), "cats hats") === 0L)
  }

  test("punctRatio is 0 for clean text and counts symbols") {
    assert(one(TextStats.punctRatio(col("text")), "abc def") === 0.0)
    assert(one(TextStats.punctRatio(col("text")), "a!!!") === 0.75)
  }

  test("langGuess spots English function words, falls back to und") {
    assert(one(TextStats.langGuess(col("text")), "walking with the dog") === "en")
    assert(one(TextStats.langGuess(col("text")), "xyzzy plugh") === "und")
  }

  test("fingerprint is whitespace- and case-insensitive") {
    val df = Seq(("A  B", "a b")).toDF("t1", "t2")
    val r = df.select(
      TextStats.fingerprint(col("t1")).as("f1"),
      TextStats.fingerprint(col("t2")).as("f2")).head()
    assert(r.getString(0) === r.getString(1))
  }

  test("qualityScore lands in [0,1]") {
    val texts = Seq("the cat sat on the mat and it is fine",
      "!!! ??? ***", "x")
    texts.foreach { t =>
      val q = one(TextStats.qualityScore(col("text")), t).asInstanceOf[Double]
      assert(q >= 0.0 && q <= 1.0, s"quality($t)=$q")
    }
  }
}
