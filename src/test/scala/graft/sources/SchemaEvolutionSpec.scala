package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Permissive schema evolution on the lake: the reference keeps
  * undeclared extra columns with a warning (SURVEY §1.3); at the
  * parquet layer the analog is mergeSchema — later batches may add
  * columns, earlier files read them as null.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions batch schemas; pre-evolution files read null") {
    val dir = Files.createTempDirectory("graft-evolve").resolve("tbl").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "payload", "score")
      .write.mode("append").parquet(dir)

    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq === Seq("id", "payload", "score"))
    val byId = df.collect().map(r =>
      r.getAs[Long]("id") -> (if (r.isNullAt(r.fieldIndex("score"))) None
                              else Some(r.getAs[Long]("score")))).toMap
    assert(byId === Map(1L -> None, 2L -> None, 3L -> Some(30L), 4L -> Some(40L)))
  }

  test("without mergeSchema a single footer wins (documented default)") {
    val dir = Files.createTempDirectory("graft-evolve2").resolve("tbl").toString
    Seq((1L, "a")).toDF("id", "payload").write.mode("append").parquet(dir)
    Seq((2L, "b", 20L)).toDF("id", "payload", "score").write.mode("append").parquet(dir)
    val cols = spark.read.parquet(dir).columns.toSet
    // default picks one footer — fewer columns than the merged view
    assert(cols.subsetOf(Set("id", "payload", "score")))
  }
}
