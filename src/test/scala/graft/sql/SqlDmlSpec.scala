package graft.sql

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.TxLogTable
import org.apache.spark.sql.DataFrame

/** SQL DELETE / UPDATE routed through Spark's parser onto the TxLog
  * copy-on-write verbs.
  */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-dml").resolve("t").toString

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("DELETE FROM with full expression grammar in the predicate") {
    val t = fresh()
    TxLogTable.append(Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (10L, "dd"))
      .toDF("id", "v").coalesce(1), t)
    SqlDml.run(spark, "DELETE FROM tbl WHERE id IN (2, 3) OR length(v) <> 2",
      Map("tbl" -> t))
    assert(rows(TxLogTable.read(spark, t)) === Set((1L, "aa"), (10L, "dd")))
  }

  test("UPDATE SET with arithmetic, CASE, and multiple assignments") {
    val t = fresh()
    TxLogTable.append(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v").coalesce(1), t)
    SqlDml.run(spark,
      "UPDATE tbl SET id = id * 10, v = CASE WHEN v = 'b' THEN 'B!' ELSE v END " +
        "WHERE id >= 2", Map("tbl" -> t))
    assert(rows(TxLogTable.read(spark, t)) ===
      Set((1L, "a"), (20L, "B!"), (30L, "c")))
  }

  test("UPDATE without WHERE touches every row; DELETE without WHERE empties") {
    val t = fresh()
    TxLogTable.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), t)
    SqlDml.run(spark, "UPDATE tbl SET v = upper(v)", Map("tbl" -> t))
    assert(rows(TxLogTable.read(spark, t)) === Set((1L, "A"), (2L, "B")))
    SqlDml.run(spark, "DELETE FROM tbl", Map("tbl" -> t))
    assert(TxLogTable.read(spark, t).count() === 0L)
  }

  test("unknown tables and non-DML statements fail loudly") {
    val t = fresh()
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v"), t)
    intercept[IllegalArgumentException] {
      SqlDml.run(spark, "DELETE FROM nope WHERE id = 1", Map("tbl" -> t))
    }
    intercept[IllegalArgumentException] {
      SqlDml.run(spark, "SELECT 1", Map("tbl" -> t))
    }
  }

  test("MERGE INTO routes the upsert-star form to the keyed merge") {
    val t = fresh()
    TxLogTable.append(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1), t)
    Seq((2L, "B!"), (9L, "i")).toDF("id", "v")
      .createOrReplaceTempView("dml_merge_src")
    SqlDml.run(spark,
      """MERGE INTO t USING dml_merge_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""",
      Map("t" -> t))
    assert(rows(TxLogTable.read(spark, t)) ===
      Set((1L, "a"), (2L, "B!"), (3L, "c"), (9L, "i")))
    // subquery source works too (analyzed by the session)
    SqlDml.run(spark,
      """MERGE INTO t USING (SELECT id + 100 AS id, upper(v) AS v
                             FROM dml_merge_src) s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""",
      Map("t" -> t))
    assert(rows(TxLogTable.read(spark, t)) ===
      Set((1L, "a"), (2L, "B!"), (3L, "c"), (9L, "i"),
        (102L, "B!"), (109L, "I")))
    // bespoke actions are rejected loudly
    intercept[IllegalArgumentException](SqlDml.run(spark,
      """MERGE INTO t USING dml_merge_src s ON t.id = s.id
         WHEN MATCHED THEN DELETE""",
      Map("t" -> t)))
  }
}
