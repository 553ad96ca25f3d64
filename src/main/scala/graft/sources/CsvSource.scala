package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.CsvReadConfig

/** Delimited-file scan, schema-on-read as ALL STRING.
  *
  * Mirrors the reference's `pd.read_csv(dtype=str)` posture
  * (app/ingestao_csv.py:33-44): no type inference — the explicit cast
  * layer (graft.cast.Casts) owns typing. Inference would both diverge
  * (e.g. "44" → int where the declared float cast yields 44.0) and cost
  * a second full scan of the data — at 100 TB that scan is real money.
  *
  * `multiLine=true` because quoted fields may embed delimiters AND
  * newlines (QUOTE_MINIMAL inputs; reference golden posts.txt:2-5).
  * Spark's CSV reader strips a UTF-8 BOM natively.
  */
object CsvSource {
  def read(spark: SparkSession, cfg: CsvReadConfig): DataFrame =
    spark.read
      .option("sep", cfg.sep)
      .option("encoding", cfg.encoding)
      .option("header", cfg.header.toString)
      .option("inferSchema", "false")
      .option("multiLine", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(cfg.path)
}
