package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.TxLogTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, GreaterThanOrEqual, Literal}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType}

/** The `graft-txlog` read format: round trips, version/timestamp time
  * travel (incl. the SQL OPTIONS surface), and committed-stats file
  * pruning driven by the query's own WHERE clause.
  */
class TxLogDataSourceSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txds").resolve("t").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSet

  /** 3 single-file appends with tight non-overlapping id ranges. */
  private def rangedTable(): String = {
    val t = freshTable()
    for (base <- Seq(0L, 10L, 20L))
      TxLogTable.append(
        (base until base + 10).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1), t)
    t
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
    case s: FileSourceScanExec => Seq(s)
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
  }.flatten

  test("format write / read round trip with version time travel") {
    val t = freshTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graft-txlog").mode("append").save(t)
    Seq((3L, "c")).toDF("id", "v")
      .write.format("graft-txlog").mode("append").save(t)
    assert(rows(spark.read.format("graft-txlog").load(t)) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(spark.read.format("graft-txlog")
      .option("versionAsOf", "1").load(t)) === Set((1L, "a"), (2L, "b")))
    Seq((9L, "z")).toDF("id", "v")
      .write.format("graft-txlog").mode("overwrite").save(t)
    assert(rows(spark.read.format("graft-txlog").load(t)) === Set((9L, "z")))
    // history intact through the format after the overwrite
    assert(rows(spark.read.format("graft-txlog")
      .option("versionAsOf", "2").load(t)) === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("timestampAsOf resolves to the newest commit at or before the instant") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v"), t)
    Thread.sleep(60) // ensure distinguishable commit mtimes (ms resolution)
    TxLogTable.append(Seq((2L, "b")).toDF("id", "v"), t)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mtime1 = fs.getFileStatus(
      new Path(t, "_txlog/00000000000000000001.txt")).getModificationTime
    val got = rows(spark.read.format("graft-txlog")
      .option("timestampAsOf", java.time.Instant.ofEpochMilli(mtime1).toString)
      .load(t))
    assert(got === Set((1L, "a")))
    // far future → latest; before first commit → loud error
    assert(rows(spark.read.format("graft-txlog")
      .option("timestampAsOf", "2999-01-01 00:00:00").load(t)) ===
      Set((1L, "a"), (2L, "b")))
    val ex = intercept[IllegalArgumentException] {
      spark.read.format("graft-txlog")
        .option("timestampAsOf", "1999-01-01 00:00:00").load(t)
    }
    assert(ex.getMessage.contains("predates"))
  }

  test("SQL users reach time travel through OPTIONS") {
    val t = freshTable()
    Seq((1L, "a")).toDF("id", "v").write.format("graft-txlog").mode("append").save(t)
    Seq((2L, "b")).toDF("id", "v").write.format("graft-txlog").mode("append").save(t)
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW txlog_v1
                  USING `graft-txlog` OPTIONS (path '$t', versionAsOf '1')""")
    assert(spark.sql("SELECT id, v FROM txlog_v1").collect().toSeq.map(_.getLong(0)) === Seq(1L))
  }

  test("the query's WHERE prunes committed files from the scan") {
    val t = rangedTable()
    val df = spark.read.format("graft-txlog").load(t).filter($"id" >= 25L)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (25L to 29L))
    val scan = scans(df.queryExecution.executedPlan).head
    assert(scan.metrics("numFiles").value === 1,
      s"expected 1 of 3 files scanned, plan:\n${df.queryExecution.executedPlan}")
    // unfiltered read touches everything
    val full = spark.read.format("graft-txlog").load(t)
    full.collect()
    assert(scans(full.queryExecution.executedPlan).head.metrics("numFiles").value === 3)
  }

  test("FileIndex-level pruning: long and date bounds drop files, unknown shapes don't") {
    val t = rangedTable()
    val idx = new TxLogFileIndex(spark, t, asOfVersion = None)
    def filesFor(es: org.apache.spark.sql.catalyst.expressions.Expression*): Int =
      idx.listFiles(Nil, es).head.files.size
    val id = AttributeReference("id", LongType)()
    assert(filesFor() === 3)
    assert(filesFor(GreaterThanOrEqual(id, Literal(25L))) === 1)
    assert(filesFor(EqualTo(id, Literal(12L))) === 1)
    assert(filesFor(GreaterThanOrEqual(id, Literal(100L))) === 0)
    // an unknown expression shape must not prune
    assert(filesFor(org.apache.spark.sql.catalyst.expressions.IsNotNull(id)) === 3)

    // date-typed bounds travel the catalyst-internal (epoch-day) form
    val td = freshTable()
    for (m <- Seq("01", "06"))
      TxLogTable.append(Seq(java.time.LocalDate.parse(s"1996-$m-15"))
        .toDF("d").coalesce(1), td)
    val didx = new TxLogFileIndex(spark, td, None)
    val d = AttributeReference("d", DateType)()
    val mar = java.time.LocalDate.parse("1996-03-01").toEpochDay.toInt
    assert(didx.listFiles(Nil,
      Seq(GreaterThanOrEqual(d, Literal(mar, DateType)))).head.files.size === 1)
  }

  test("IN-list envelope and string prefix bounds prune; mixed shapes stay conservative") {
    val t = rangedTable() // files: ids 0-9, 10-19, 20-29
    val idx = new TxLogFileIndex(spark, t, asOfVersion = None)
    val id = AttributeReference("id", LongType)()
    import org.apache.spark.sql.catalyst.expressions.{In, Literal => L, StartsWith}
    // IN {2, 7} → envelope [2, 7] → first file only
    assert(idx.listFiles(Nil,
      Seq(In(id, Seq(L(2L), L(7L))))).head.files.size === 1)
    // IN {5, 25} envelope spans everything — conservative full read
    assert(idx.listFiles(Nil,
      Seq(In(id, Seq(L(5L), L(25L))))).head.files.size === 3)

    val ts = freshTable()
    graft.sink.TxLogTable.append(Seq(("alpha", 1L), ("bravo", 2L)).toDF("s", "x").coalesce(1), ts)
    graft.sink.TxLogTable.append(Seq(("mike", 3L), ("oscar", 4L)).toDF("s", "x").coalesce(1), ts)
    val sidx = new TxLogFileIndex(spark, ts, None)
    val sAttr = AttributeReference("s", org.apache.spark.sql.types.StringType)()
    import org.apache.spark.unsafe.types.UTF8String
    assert(sidx.listFiles(Nil, Seq(StartsWith(sAttr,
      L(UTF8String.fromString("os"), org.apache.spark.sql.types.StringType))))
      .head.files.size === 1, "prefix lower bound should drop the alpha/bravo file")

    // end-to-end: the pruned IN read equals the plain filter
    val got = spark.read.format("graft-txlog").load(t)
      .filter($"id".isin(2L, 7L)).collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 7L))
  }

  test("changesFrom option serves the change feed through the format") {
    val t = freshTable()
    Seq((1L, "a")).toDF("id", "v").write.format("graft-txlog").mode("append").save(t)
    Seq((2L, "b")).toDF("id", "v").write.format("graft-txlog").mode("append").save(t)
    TxLogTable.merge(spark, t, Seq((1L, "A")).toDF("id", "v"), "id")
    val feed = spark.read.format("graft-txlog")
      .option("changesFrom", "1").load(t)
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(feed === Set(
      (2L, "b", "insert", 2L),
      (1L, "a", "delete", 3L), (1L, "A", "insert", 3L)))
    // bounded range through changesTo
    val bounded = spark.read.format("graft-txlog")
      .option("changesFrom", "1").option("changesTo", "2").load(t)
    assert(bounded.count() === 1L)
  }

  test("history lists versions with actions newest-first") {
    val t = freshTable()
    graft.sink.TxLogTable.append(Seq((1L, "a")).toDF("id", "v").coalesce(1), t)
    graft.sink.TxLogTable.append(Seq((2L, "b")).toDF("id", "v").coalesce(1), t,
      txn = Some(("histApp", 7L)))
    graft.sink.TxLogTable.overwrite(Seq((3L, "c")).toDF("id", "v"), t)
    val h = graft.sink.TxLogTable.history(spark, t)
      .select("version", "action", "txn_app", "txn_epoch").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(h.toSeq === Seq(
      (3L, "overwrite", None, None),
      (2L, "append", Some("histApp"), Some(7L)),
      (1L, "append", None, None)))
    // DML versions carry their operation name (DESCRIBE HISTORY parity)
    graft.sink.TxLogTable.delete(spark, t, "id = 3")
    graft.sink.TxLogTable.restore(spark, t, 3L)
    val ops = graft.sink.TxLogTable.history(spark, t)
      .select("version", "action", "operation").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(ops.take(2) === Seq(
      (5L, "overwrite", "restore to v3"),
      (4L, "rewrite", "delete")))
    assert(ops.last === ((1L, "append", "append")),
      "op falls back to the action for plain commits")
  }
}
