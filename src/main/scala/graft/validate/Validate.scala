package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema-gate errors (reference app/utils/validate.py:4-5). */
final class SchemaError(msg: String) extends RuntimeException(msg)

/** Two-phase, config-driven schema validation:
  * required-columns before casting, dtype assertion after casting
  * (reference app/utils/validate.py:7-30). Driver-side metadata checks
  * only — no Spark job is triggered.
  */
object Validate {

  /** Raise if any required column is absent
    * (reference `ensure_required_columns`, app/utils/validate.py:7-10).
    */
  def ensureRequiredColumns(df: DataFrame, required: Seq[String]): Unit = {
    val have = df.columns.toSet
    val missing = required.filterNot(have.contains)
    if (missing.nonEmpty)
      throw new SchemaError(s"missing required columns: ${missing.mkString(", ")}")
  }

  /** Columns present in the frame but not declared anywhere — kept, but
    * reported (permissive evolution; reference app/ingestao_csv.py:53-61).
    */
  def undeclaredColumns(df: DataFrame, declared: Seq[String]): Seq[String] = {
    val known = declared.toSet
    df.columns.filterNot(known.contains).toIndexedSeq
  }

  /** Post-cast dtype assertion (reference `check_dtypes`,
    * app/utils/validate.py:12-30): integer fields must be LongType,
    * string fields StringType, float fields DoubleType. Missing columns
    * are skipped (same permissive contract as the cast layer).
    */
  def checkDtypes(
      df: DataFrame,
      integerFields: Seq[String] = Nil,
      stringFields: Seq[String] = Nil,
      floatFields: Seq[String] = Nil): Unit = {
    val types: Map[String, DataType] = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def bad(fields: Seq[String], expected: DataType): Seq[String] =
      fields.flatMap { f =>
        types.get(f).collect { case t if t != expected => s"$f: expected ${expected.simpleString}, got ${t.simpleString}" }
      }
    val problems =
      bad(integerFields, LongType) ++ bad(stringFields, StringType) ++ bad(floatFields, DoubleType)
    if (problems.nonEmpty)
      throw new SchemaError(s"dtype mismatches: ${problems.mkString("; ")}")
  }

  /** Validate that every requested preview/projection column exists
    * (reference app/ingestao_csv.py:80-85). Returns the columns for
    * convenient chaining.
    */
  def ensureProjectable(df: DataFrame, cols: Seq[String]): Seq[String] = {
    val have = df.columns.toSet
    val missing = cols.filterNot(have.contains)
    if (missing.nonEmpty)
      throw new SchemaError(s"preview columns not in frame: ${missing.mkString(", ")}")
    cols
  }
}
