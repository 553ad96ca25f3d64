package graft.sink

import java.nio.file.Files

import graft.SparkSpec

/** Table properties (TBLPROPERTIES) and in-commit timestamps. */
class TablePropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("tblprops").resolve("t").toString

  test("set / unset / survive overwrite, restore and checkpoints") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("k", "v"), t)
    TxLogTable.setProperties(spark, t,
      Map("pipeline.owner" -> "ingest", "quality.tier" -> "bronze"))
    assert(TxLogTable.properties(spark, t) ===
      Map("pipeline.owner" -> "ingest", "quality.tier" -> "bronze"))
    // upsert one, drop one
    TxLogTable.setProperties(spark, t, Map("quality.tier" -> "silver"))
    TxLogTable.unsetProperties(spark, t, Seq("pipeline.owner", "missing.ok"))
    assert(TxLogTable.properties(spark, t) === Map("quality.tier" -> "silver"))
    // survive a full overwrite (table-level metadata, like constraints)
    TxLogTable.overwrite(Seq((9L, "z")).toDF("k", "v"), t)
    assert(TxLogTable.properties(spark, t) === Map("quality.tier" -> "silver"))
    // fold through a checkpoint
    TxLogTable.checkpoint(spark, t)
    TxLogTable.append(Seq((2L, "b")).toDF("k", "v"), t)
    assert(TxLogTable.properties(spark, t) === Map("quality.tier" -> "silver"))
    // restore keeps them too (they are not part of a version's data)
    TxLogTable.restore(spark, t, 1L)
    assert(TxLogTable.properties(spark, t) === Map("quality.tier" -> "silver"))
    // properties are metadata commits — contents untouched
    assert(TxLogTable.read(spark, t).count() === 1L)
  }

  test("SQL surface: CREATE ... TBLPROPERTIES, ALTER SET/UNSET, SHOW") {
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.warehouse",
        Files.createTempDirectory("tblprops_wh").toString)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.props")
    val name = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"""CREATE TABLE graft.props.$name (k BIGINT)
                  TBLPROPERTIES ('team' = 'data', 'tier' = 'bronze')""")
    def shown(): Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES graft.props.$name").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown().get("team") === Some("data"))
    assert(shown().get("tier") === Some("bronze"))
    spark.sql(s"ALTER TABLE graft.props.$name SET TBLPROPERTIES ('tier' = 'silver')")
    spark.sql(s"ALTER TABLE graft.props.$name UNSET TBLPROPERTIES ('team')")
    assert(shown().get("tier") === Some("silver"))
    assert(shown().get("team") === None)
    // engine-synthesized keys surface through the catalog API (SHOW
    // hides Spark-reserved ones like 'provider' by design)
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.sources.GraftCatalog]
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("props"), name))
    assert(tbl.properties().get("provider") === "graft-txlog")
    assert(tbl.properties().get("tier") === "silver")
  }

  test("in-commit timestamps are recorded, monotonic, and drive time travel") {
    val t = freshTable()
    (1 to 5).foreach(i => TxLogTable.append(Seq((i.toLong, "x")).toDF("k", "v"), t))
    val hist = TxLogTable.history(spark, t)
      .select("version", "timestamp").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    // strictly increasing across rapid same-millisecond commits
    val byVersion = hist.toSeq.sortBy(_._1).map(_._2)
    byVersion.sliding(2).foreach {
      case Seq(a, b) => assert(a < b, s"timestamps not monotonic: $hist")
      case _ =>
    }
    // timestampAsOf resolves against the RECORDED stamps: exactly at
    // v3's stamp → v3; just before it → v2
    val v3ts = hist(3L)
    assert(TxLogTable.versionAtTimestamp(spark, t, v3ts) === 3L)
    assert(TxLogTable.versionAtTimestamp(spark, t, v3ts - 1L) === 2L)
    val atV3 = spark.read.format("graft-txlog")
      .option("timestampAsOf", java.time.Instant.ofEpochMilli(v3ts).toString)
      .load(t)
    assert(atV3.count() === 3L)
  }
}
