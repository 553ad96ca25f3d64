package graft.validate

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, "a", 1.5)).toDF("id", "name", "score")

  test("ensureRequiredColumns passes when all present") {
    Validate.ensureRequiredColumns(df, Seq("id", "name"))
  }

  test("ensureRequiredColumns raises SchemaError listing the missing") {
    val e = intercept[SchemaError] {
      Validate.ensureRequiredColumns(df, Seq("id", "nope", "also_nope"))
    }
    assert(e.getMessage.contains("nope"))
    assert(e.getMessage.contains("also_nope"))
  }

  test("undeclaredColumns reports extras but never drops them") {
    assert(Validate.undeclaredColumns(df, Seq("id", "name")) === Seq("score"))
    assert(df.columns.length === 3)
  }

  test("checkDtypes passes on matching types, skips missing columns") {
    Validate.checkDtypes(df,
      integerFields = Seq("id", "missing_is_ok"),
      stringFields = Seq("name"),
      floatFields = Seq("score"))
  }

  test("checkDtypes raises on a wrong dtype") {
    val e = intercept[SchemaError] {
      Validate.checkDtypes(df, integerFields = Seq("name"))
    }
    assert(e.getMessage.contains("name"))
  }

  test("ensureProjectable raises on unknown preview columns") {
    assert(Validate.ensureProjectable(df, Seq("id")) === Seq("id"))
    intercept[SchemaError] { Validate.ensureProjectable(df, Seq("ghost")) }
  }
}
