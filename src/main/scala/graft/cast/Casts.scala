package graft.cast

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar cast layer — the engine's type-coercion surface.
  *
  * Mirrors the semantics of the reference's casting utilities
  * (reference: app/utils/casting.py:5-53) re-expressed as Spark
  * `Column => Column` functions. These compose built-in Catalyst
  * expressions only, so whole-stage codegen applies; no UDFs.
  *
  * All casts are *permissive*: unparseable input yields NULL (the
  * reference's `errors="coerce"` behavior), which under Spark 4's
  * default ANSI mode requires `try_cast` rather than `cast`.
  */
object Casts {

  /** String → nullable BIGINT, accepting integral float-shaped strings.
    *
    * Reference `to_int` (app/utils/casting.py:5-6) uses
    * `pd.to_numeric(errors="coerce").astype("Int64")`, which accepts
    * "12.0" → 12 and coerces garbage to NULL. A single
    * `try_cast(x AS BIGINT)` would reject "12.0", so we go through
    * DOUBLE first. Non-integral values ("12.7") yield NULL — pandas
    * raises on the unsafe float→Int64 cast there, and silently
    * truncating would mangle malformed integer fields; NULL is the
    * per-value analogue of that error under coerce semantics. Values
    * outside the BIGINT range also yield NULL (try_cast).
    */
  def toLongLenient(c: Column): Column = {
    val d = c.cast(StringType).try_cast(DoubleType)
    when(floor(d) === d, d.try_cast(LongType))
  }

  /** Trim + strip one layer of surrounding double quotes.
    * Reference `to_str` (app/utils/casting.py:9-10). NULL stays NULL
    * (divergence from pandas' astype(str) which renders "nan"; see
    * SURVEY.md §7.4 — golden data has no nulls in string fields).
    */
  def toCleanString(c: Column): Column =
    regexp_replace(trim(c.cast(StringType)), "^\"|\"$", "")

  /** Brazilian-locale numeric string → nullable DOUBLE.
    *
    * Reference `to_float_pt` (app/utils/casting.py:13-24): remove `.`
    * thousands separators FIRST, then swap decimal `,` → `.`, then
    * coerce; unparseable → NULL. Order matters: "1.234,56" → "1234,56"
    * → "1234.56" → 1234.56.
    */
  def toDoublePt(c: Column): Column =
    regexp_replace(regexp_replace(c.cast(StringType), "\\.", ""), ",", ".")
      .try_cast(DoubleType)

  /** Already-numeric columns pass through `to_float_pt` unchanged in the
    * reference (app/utils/casting.py:14-16); callers on typed columns
    * should use a plain double cast.
    */
  def toDouble(c: Column): Column = c.try_cast(DoubleType)

  /** Apply per-type cast lists to the columns that exist; missing
    * columns are silently skipped (reference `apply_casts`,
    * app/utils/casting.py:27-37 — the `if col in df` guard).
    *
    * One `select` (not N `withColumn`s) so the analyzer sees a single
    * projection — keeps the plan shallow at wide schemas.
    */
  def applyCasts(
      df: DataFrame,
      integerFields: Seq[String] = Nil,
      stringFields: Seq[String] = Nil,
      floatFields: Seq[String] = Nil): DataFrame = {
    val ints = integerFields.toSet
    val strs = stringFields.toSet
    val flts = floatFields.toSet
    val projected = df.columns.map { name =>
      val c = col(name)
      val cast =
        if (ints.contains(name)) toLongLenient(c)
        else if (strs.contains(name)) toCleanString(c)
        else if (flts.contains(name)) toDoublePt(c)
        else c
      cast.as(name)
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** Rename columns per mapping; unmatched keys are no-ops (pandas
    * `rename` semantics, reference app/ingestao_csv.py:19-20).
    */
  def renameColumns(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    val applicable = mapping.filter { case (from, _) => df.columns.contains(from) }
    df.withColumnsRenamed(applicable)
  }

  /** Ingestion-date partition value, `YYYYMMDD` (reference
    * app/utils/date.py:5-6). Injectable clock for tests.
    */
  def todayYyyymmdd(clock: java.time.Clock = java.time.Clock.systemDefaultZone()): String =
    java.time.LocalDate.now(clock).format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
}
