package graft.meta

import graft.SparkSpec
import java.nio.file.Files

class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private val clock = java.time.Clock.fixed(
    java.time.Instant.parse("2025-10-20T12:00:00Z"), java.time.ZoneOffset.UTC)
  private val ds = DatasetInfo("ds", "test", ";", "UTF-8", "anomesdia", "20251020", "r1", "graft")

  test("tableStats: one job for rows + all null counts") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None))
      .toDF("i", "s")
    val (rows, nulls) = Manifest.tableStats(df)
    assert(rows === 3L)
    assert(nulls === Map("i" -> 1L, "s" -> 1L))
  }

  test("forFileOnly: header columns, line count minus header, BOM stripped") {
    val tmp = Files.createTempDirectory("graft-manifest")
    val f = tmp.resolve("data.csv")
    Files.write(f, "﻿a;b;c\n1;2;3\n4;5;6\n".getBytes("UTF-8"))
    val m = Manifest.forFileOnly(spark, f.toString, ds, clock = clock)
    assert(m.schemaStats.columns === Seq("a", "b", "c"))
    assert(m.schemaStats.rows === 2L)
    assert(m.core.sizeBytes === Files.size(f))
    assert(m.core.generatedAt === "2025-10-20T12:00:00")
    assert(m.core.md5.length === 32)
  }

  test("toJson escapes control characters and quotes") {
    val m = Manifest(
      CoreInfo("f\"n", "/d", 1L, "00", "2025-10-20T12:00:00"),
      ds,
      SchemaStats(Seq("c\t1"), Map("c\t1" -> "string"), 1L, Map("c\t1" -> 0L), Seq()))
    val js = Manifest.toJson(m)
    assert(js.contains("f\\\"n"))
    assert(js.contains("c\\t1"))
    // must be parseable JSON
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
  }

  test("forFileOnly on a missing file raises FileNotFoundException") {
    intercept[java.io.FileNotFoundException] {
      Manifest.forFileOnly(spark, "/tmp/graft-does-not-exist.csv", ds, clock = clock)
    }
  }
}
