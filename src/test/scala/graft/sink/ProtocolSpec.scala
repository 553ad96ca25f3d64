package graft.sink

import java.nio.file.Files

import graft.SparkSpec
/** Protocol / table-features gating: declared reader/writer feature
  * lists, loud refusal of unknown features, auto-declaration by
  * feature-using commits, and feature inference at upgrade time.
  */
class ProtocolSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("protocol").resolve("t").toString

  test("undeclared tables are legacy: everything works, protocol is empty") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("k", "v"), t)
    assert(TxLogTable.protocol(spark, t) === ((Set.empty, Set.empty)))
    assert(TxLogTable.read(spark, t).count() === 1L)
  }

  test("upgradeProtocol declares features; unknown requests are refused") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLogTable.upgradeProtocol(spark, t,
      readerFeatures = Set("deletionVectors"),
      writerFeatures = Set("deletionVectors", "checkConstraints"))
    val (r, w) = TxLogTable.protocol(spark, t)
    assert(r === Set("deletionVectors"))
    assert(w === Set("deletionVectors", "checkConstraints"))
    val e = intercept[IllegalArgumentException] {
      TxLogTable.upgradeProtocol(spark, t, readerFeatures = Set("timeCrystals"))
    }
    assert(e.getMessage.contains("timeCrystals"))
    // reads and writes still fine — all declared features implemented
    TxLogTable.append(Seq((2L, "b")).toDF("k", "v"), t)
    assert(TxLogTable.read(spark, t).count() === 2L)
  }

  test("a table from a newer engine: unknown READER feature blocks reads and writes") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("k", "v"), t)
    // raw property write simulates a future engine's table
    TxLogTable.setProperties(spark, t,
      Map(TxLogTable.ReaderFeaturesProp -> "deletionVectors,quantumRows"))
    val readErr = intercept[TxLogTable.ProtocolError] {
      TxLogTable.read(spark, t).count()
    }
    assert(readErr.getMessage.contains("quantumRows"))
    assert(readErr.getMessage.contains("reader"))
    intercept[TxLogTable.ProtocolError] {
      TxLogTable.append(Seq((2L, "b")).toDF("k", "v"), t)
    }
    intercept[TxLogTable.ProtocolError] {
      TxLogTable.changes(spark, t, 0L, 2L).count()
    }
    // diagnostics stay reachable: properties() is metadata-only
    assert(TxLogTable.properties(spark, t)
      .contains(TxLogTable.ReaderFeaturesProp))
  }

  test("unknown WRITER feature blocks writes and DDL but reads still serve") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLogTable.setProperties(spark, t,
      Map(TxLogTable.WriterFeaturesProp -> "epochFencing"))
    // reads fine: reader features are undeclared/empty
    assert(TxLogTable.read(spark, t).count() === 1L)
    val e = intercept[TxLogTable.ProtocolError] {
      TxLogTable.append(Seq((2L, "b")).toDF("k", "v"), t)
    }
    assert(e.getMessage.contains("epochFencing") && e.getMessage.contains("writer"))
    intercept[TxLogTable.ProtocolError] {
      TxLogTable.renameColumn(spark, t, "v", "val")
    }
    intercept[TxLogTable.ProtocolError] {
      TxLogTable.addConstraint(spark, t, "k_pos", "k > 0")
    }
    intercept[TxLogTable.ProtocolError] {
      TxLogTable.setProperties(spark, t, Map("x" -> "y"))
    }
    intercept[TxLogTable.ProtocolError] {
      TxLogTable.deleteVectors(spark, t, "k = 1")
    }
    intercept[TxLogTable.ProtocolError] {
      TxLogTable.restore(spark, t, 1L)
    }
    // restore-to-current writes nothing, but still refuses: the
    // caller must hear "this table is unwritable" on the restore
    // call, not on the next mutating one
    intercept[TxLogTable.ProtocolError] {
      TxLogTable.restore(spark, t, TxLogTable.versions(spark, t).max)
    }
    intercept[TxLogTable.ProtocolError] {
      TxLogTable.addColumns(spark, t,
        org.apache.spark.sql.types.StructType.fromDDL("extra BIGINT"))
    }
    // time travel to the pre-declaration version still reads — the
    // protocol is versioned state like any other metadata
    assert(TxLogTable.read(spark, t, asOfVersion = Some(1L)).count() === 1L)
  }

  test("feature-using commits auto-declare on a table WITH a protocol") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t)
    TxLogTable.upgradeProtocol(spark, t)
    assert(TxLogTable.protocol(spark, t) === ((Set.empty, Set.empty)))
    // no-arg upgrade on a plain table declares EMPTY lists — the
    // props now exist, so later feature use must extend them
    TxLogTable.deleteVectors(spark, t, "k = 2")
    val (r1, w1) = TxLogTable.protocol(spark, t)
    assert(r1.contains("deletionVectors") && w1.contains("deletionVectors"))
    TxLogTable.renameColumn(spark, t, "v", "name")
    val (r2, w2) = TxLogTable.protocol(spark, t)
    assert(r2.contains("columnMapping") && w2.contains("columnMapping"))
    TxLogTable.addConstraint(spark, t, "k_pos", "k > 0")
    val (r3, w3) = TxLogTable.protocol(spark, t)
    assert(r3.contains("checkConstraints") && w3.contains("checkConstraints"))
    // and the table still reads correctly through all of it
    assert(TxLogTable.read(spark, t).select("k").as[Long].collect().sorted
      === Array(1L, 3L))
  }

  test("legacy tables do NOT auto-declare: no protocol props appear") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLogTable.deleteVectors(spark, t, "k = 2")
    TxLogTable.renameColumn(spark, t, "v", "name")
    assert(TxLogTable.protocol(spark, t) === ((Set.empty, Set.empty)))
  }

  test("upgradeProtocol infers the features already in use") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t)
    TxLogTable.deleteVectors(spark, t, "k = 2")
    TxLogTable.renameColumn(spark, t, "v", "name")
    TxLogTable.addConstraint(spark, t, "k_pos", "k > 0")
    TxLogTable.upgradeProtocol(spark, t) // no explicit features
    val (r, w) = TxLogTable.protocol(spark, t)
    assert(r === Set("deletionVectors", "columnMapping", "checkConstraints"))
    assert(w === r)
  }

  test("empty property values round-trip through commits and checkpoints") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLogTable.setProperties(spark, t, Map("empty.marker" -> ""))
    assert(TxLogTable.properties(spark, t) === Map("empty.marker" -> ""))
    TxLogTable.checkpoint(spark, t)
    TxLogTable.append(Seq((2L, "b")).toDF("k", "v"), t)
    assert(TxLogTable.properties(spark, t) === Map("empty.marker" -> ""))
  }

  test("protocol survives checkpoint, overwrite and restore") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLogTable.upgradeProtocol(spark, t, readerFeatures = Set("columnMapping"))
    TxLogTable.checkpoint(spark, t)
    TxLogTable.overwrite(Seq((9L, "z")).toDF("k", "v"), t)
    val (r, _) = TxLogTable.protocol(spark, t)
    assert(r === Set("columnMapping"))
    TxLogTable.restore(spark, t, 1L)
    assert(TxLogTable.protocol(spark, t)._1 === Set("columnMapping"))
  }

  test("format stream is protocol-gated: unknown reader feature stops it, incl. mid-stream") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("k", "v").coalesce(1), t)
    val ckpt = Files.createTempDirectory("proto_sckpt").toString
    val out = Files.createTempDirectory("proto_sout").resolve("o").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-txlog").load(t)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out).start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // all-implemented features: streams fine
    assert(spark.read.parquet(out).count() === 1L)
    // a future engine extends the protocol MID-STREAM (append lands
    // first — writes on the poisoned table would be refused too)
    TxLogTable.append(Seq((2L, "b")).toDF("k", "v").coalesce(1), t)
    TxLogTable.setProperties(spark, t,
      Map(TxLogTable.ReaderFeaturesProp -> "quantumRows"))
    val resumed = intercept[Exception] { run() }
    assert(causeMessages(resumed).exists(_.contains("quantumRows")),
      s"restarted stream must refuse, got: ${causeMessages(resumed)}")
    // a FRESH stream on the poisoned table is refused at creation
    val fresh = intercept[Exception] {
      val q = spark.readStream.format("graft-txlog").load(t)
        .writeStream.format("parquet")
        .option("checkpointLocation",
          Files.createTempDirectory("proto_sckpt2").toString)
        .option("path",
          Files.createTempDirectory("proto_sout2").resolve("o").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(causeMessages(fresh).exists(_.contains("quantumRows")),
      s"fresh stream must refuse, got: ${causeMessages(fresh)}")
  }

  test("catalog stream (readStream.table) is protocol-gated on reader features") {
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.warehouse",
        Files.createTempDirectory("proto_wh").toString)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.proto")
    val name = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE graft.proto.$name (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO graft.proto.$name VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE graft.proto.$name SET TBLPROPERTIES " +
      s"('${TxLogTable.ReaderFeaturesProp}' = 'quantumRows')")
    val err = intercept[Exception] {
      val q = spark.readStream.table(s"graft.proto.$name")
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("proto_cckpt").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(causeMessages(err).exists(_.contains("quantumRows")),
      s"catalog stream must refuse, got: ${causeMessages(err)}")
  }
}
