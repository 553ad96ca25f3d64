package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Extended, Extras, Extras2, Extras3, Extras4, Extras5, Extras6, Extras7, Extras8, Extras9, Extras10, Extras11, Extras12, Extras13, Extras14, Extras15, Extras16, Extras17, Extras18, Extras19, Extras20, Extras21, Extras22, Extras23, Extras24, Extras25, Extras26, Extras27, Extras28, Extras29, Extras30, Extras31, Extras32, Extras33, Extras34, Extras35, PipelineOps, QueryDef, Relational, Sketches, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the
  * LLM-pipeline extensions: dedup, similarity search, multimodal,
  * text analysis) is exposed as a named query over the testdata star
  * schema, with an equivalent DuckDB oracle where SQL-expressible.
  */
object SparkEntry {

  private val defs: Seq[QueryDef] =
    Relational.all ++ TextOps.all ++ VectorOps.all ++ Extended.all ++ PipelineOps.all ++ Sketches.all ++ Extras.all ++ Extras2.all ++ Extras3.all ++ Extras4.all ++ Extras5.all ++ Extras6.all ++ Extras7.all ++ Extras8.all ++ Extras9.all ++ Extras10.all ++ Extras11.all ++ Extras12.all ++ Extras13.all ++ Extras14.all ++ Extras15.all ++ Extras16.all ++ Extras17.all ++ Extras18.all ++ Extras19.all ++ Extras20.all ++ Extras21.all ++ Extras22.all ++ Extras23.all ++ Extras24.all ++ Extras25.all ++ Extras26.all ++ Extras27.all ++ Extras28.all ++ Extras29.all ++ Extras30.all ++ Extras31.all ++ Extras32.all ++ Extras33.all ++ Extras34.all ++ Extras35.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q18_q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every query carries an oracle: even the
    * engine-specific sketch estimates (q66/q67) are verified through
    * their CONTRACT — exact value hash-compared, estimate-within-bound
    * boolean asserted TRUE — with portable twins (q81/q82) and
    * `SketchSpec` covering the raw estimates.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin)).toMap
}
