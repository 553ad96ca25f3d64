package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Extended, Extras, Extras2, PipelineOps, QueryDef, Relational, Sketches, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the
  * LLM-pipeline extensions: dedup, similarity search, multimodal,
  * text analysis) is exposed as a named query over the testdata star
  * schema, with an equivalent DuckDB oracle where SQL-expressible.
  */
object SparkEntry {

  private val defs: Seq[QueryDef] =
    Relational.all ++ TextOps.all ++ VectorOps.all ++ Extended.all ++ PipelineOps.all ++ Sketches.all ++ Extras.all ++ Extras2.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q18_q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (custom expressions / mapPartitions) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin)).toMap
}
