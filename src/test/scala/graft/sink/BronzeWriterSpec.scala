package graft.sink

import graft.SparkSpec
import graft.config.SinkConfig
import java.nio.file.Files

class BronzeWriterSpec extends SparkSpec {
  import spark.implicits._

  private val df3 = Seq((1L, "a"), (2L, "b;semi"), (3L, null.asInstanceOf[String]))
    .toDF("id", "v")

  test("csv mode: single named file, header, nulls empty, quoted delimiter") {
    val base = Files.createTempDirectory("graft-bw").toString
    val out = BronzeWriter.write(spark, df3,
      SinkConfig(base, "t1", "data.txt"), "20251020")
    assert(out.endsWith("t1/anomesdia=20251020/data.txt"))
    val lines = scala.io.Source.fromFile(new java.net.URI(out).getPath match {
      case "" => out; case p => p
    }).getLines().toList
    assert(lines.head === "id;v")
    assert(lines.exists(_.contains("\"b;semi\"")))  // delimiter-bearing field quoted
    assert(lines.exists(_ == "3;"))                 // null → empty
  }

  test("parquet mode: partition dir round-trips") {
    val base = Files.createTempDirectory("graft-bw-parquet").toString
    val dir = BronzeWriter.write(spark, df3,
      SinkConfig(base, "t2", "ignored", format = "parquet"), "20251020",
      singleFile = false)
    val back = spark.read.parquet(dir)
    assert(back.count() === 3)
    assert(back.columns.toSet === Set("id", "v"))
  }

  test("unsupported format raises") {
    intercept[IllegalArgumentException] {
      BronzeWriter.write(spark, df3,
        SinkConfig("/tmp/x", "t3", "f", format = "avro"), "20251020")
    }
  }
}
