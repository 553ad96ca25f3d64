package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, document
  * fingerprinting. All are per-row expressions built from codegen'd
  * built-ins — no UDFs, no shuffles; they scale linearly with the scan
  * and stay inside whole-stage codegen.
  */
object TextStats {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count as BIGINT (cast so engines that count in 32 vs 64 bit
    * agree on schema). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** A BPE-ish subword segmentation: whitespace-separated runs plus a
    * cut at every letter↔digit boundary, keeping punctuation attached —
    * a cheap deterministic proxy for a real tokenizer's token count.
    *
    * Counted as (non-space runs) + (in-run letter↔digit boundaries)
    * with two regexp_counts — identical to splitting and discarding
    * empties, but fully codegen'd (a `filter` higher-order-function
    * lambda is evaluated interpreted per element; measured a whole-suite
    * bottleneck at sf0.1).
    */
  def subwordCount(text: Column): Column =
    (regexp_count(text, lit("[^\\s]+")) +
      regexp_count(text, lit("(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])")))
      .cast(LongType)

  private val StopWords = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Stopword hits per document (quality signal).
    *
    * Space-padded regexp_count over the raw text — exactly the tokens a
    * single-space split would yield (every token is space-delimited in
    * the padded form), without materializing the token array and without
    * an interpreted `filter` lambda per token. Codegen'd; one linear
    * regex scan per document.
    */
  def stopwordCount(text: Column): Column =
    regexp_count(concat(lit(" "), text, lit(" ")),
      lit("(?<= )(" + StopWords.mkString("|") + ")(?= )")).cast(LongType)

  /** Ratio of non-alphanumeric, non-space chars to total chars. */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast(DoubleType) /
      greatest(length(text).cast(DoubleType), lit(1.0)), 4)

  /** Mean word length (chars excluding separators / word count). */
  def avgWordLen(text: Column): Column =
    round((length(text) - (tokenCount(text) - lit(1L))).cast(DoubleType) /
      greatest(tokenCount(text).cast(DoubleType), lit(1.0)), 4)

  /** Composite quality score in [0,1]: rewards stopword presence and
    * moderate word length, penalizes punctuation noise. Deterministic,
    * fully expression-based.
    */
  def qualityScore(text: Column): Column = {
    val stopRatio = stopwordCount(text).cast(DoubleType) /
      greatest(tokenCount(text).cast(DoubleType), lit(1.0))
    round(
      least(stopRatio * 2.0, lit(1.0)) * 0.5
        + when(avgWordLen(text).between(3.0, 9.0), 0.3).otherwise(0.0)
        + when(punctRatio(text) <= 0.05, 0.2).otherwise(0.0),
      4)
  }

  /** Language-ID heuristic: function-word evidence votes, first match
    * wins (en → es → de → fr → zh by stopword sets), default "und".
    * A real n-gram profile model drops in behind the same column
    * contract; this keeps the decision SQL-expressible for the oracle.
    */
  def langGuess(text: Column): Column = {
    def hasAny(words: Seq[String]): Column = {
      val padded = concat(lit(" "), text, lit(" "))
      words.map(w => padded.contains(s" $w ")).reduce(_ || _)
    }
    when(hasAny(Seq("the", "and", "with")), "en")
      .when(hasAny(Seq("el", "la", "los", "que")), "es")
      .when(hasAny(Seq("der", "die", "und", "das")), "de")
      .when(hasAny(Seq("le", "les", "des", "est")), "fr")
      .when(hasAny(Seq("de", "shi", "zai")), "zh")
      .otherwise("und")
  }

  /** Canonical document fingerprint: md5 of the
    * whitespace-normalized, lower-cased text. Identical content with
    * cosmetic whitespace/case differences collides — the standard exact
    * -dedup key at corpus scale (hash once, group by 128-bit key).
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Per-document stats frame over a corpus (doc_id, text, lang). */
  def documentStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("lang"),
      tokenCount(col("text")).as("n_tokens"),
      length(col("text")).cast(LongType).as("n_chars_actual"),
      stopwordCount(col("text")).as("n_stopwords"),
      punctRatio(col("text")).as("punct_ratio"),
      avgWordLen(col("text")).as("avg_word_len"),
      qualityScore(col("text")).as("quality"),
      fingerprint(col("text")).as("fp"))
}
