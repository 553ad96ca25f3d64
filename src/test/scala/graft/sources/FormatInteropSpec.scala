package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Format interoperability: the lake is never one format. Beyond the
  * reference's CSV surface (CsvSource / GoldenParitySpec) and the
  * parquet star schema, the engine must round-trip ORC and JSONL with
  * schema fidelity — both ship inside Spark, no extra jars.
  */
class FormatInteropSpec extends SparkSpec {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def roundTrips(format: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-$format").toString + "/t"
    docs.write.format(format).mode("overwrite").save(dir)
    val back = format match {
      // JSON is schemaless on read — supply the schema, as a real
      // ingestion contract would, instead of paying double-pass inference
      case "json" => spark.read.schema(docs.schema).format(format).load(dir)
      case _      => spark.read.format(format).load(dir)
    }
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      docs.schema.map(f => (f.name, f.dataType)))
    assert(back.count() === docs.count())
    assert(back.except(docs).count() === 0)
    assert(docs.except(back).count() === 0)
  }

  test("ORC round-trips the documents table with identical schema and rows") {
    roundTrips("orc")
  }

  test("JSONL round-trips the documents table under an explicit schema") {
    roundTrips("json")
  }

  test("ORC scan pushes filters and prunes columns like parquet") {
    val dir = Files.createTempDirectory("graft-orc-push").toString + "/t"
    docs.write.format("orc").mode("overwrite").save(dir)
    val plan = spark.read.format("orc").load(dir)
      .filter(col("lang") === "en").select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"missing pushed filter in:\n$plan")
  }
}
