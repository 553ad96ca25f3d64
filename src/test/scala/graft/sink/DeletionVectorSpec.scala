package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors: a DELETE that commits a row-id
  * mask instead of rewriting files. Covers the mask semantics (read /
  * time travel / stacking), the never-resurrect interplay with
  * copy-on-write rewrites, compaction as materialization, the
  * format/catalog fallbacks, the change feed, clones/restore, and the
  * streaming guard.
  */
class DeletionVectorSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("dvspec").resolve("t").toString

  /** 3 single-file appends: k in [0,10), [10,20), [20,30). */
  private def rangedTable(): String = {
    val t = freshTable()
    for (base <- Seq(0L, 10L, 20L))
      TxLogTable.append(
        (base until base + 10).map(i => (i, s"r$i")).toDF("k", "v").coalesce(1), t)
    t
  }

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  private def dataFiles(t: String): Set[String] = {
    val d = new java.io.File(s"$t/data")
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
  }

  test("deleteVectors masks rows without touching any data file") {
    val t = rangedTable()
    val before = dataFiles(t)
    val v = TxLogTable.deleteVectors(spark, t, "k % 10 = 0")
    assert(v === 4L)
    assert(dataFiles(t) === before, "no data file may move for a DV delete")
    assert(keys(TxLogTable.read(spark, t)) ===
      (0L until 30L).filterNot(_ % 10 == 0).toSet)
    // time travel to the pre-delete version still sees every row
    assert(keys(TxLogTable.read(spark, t, Some(3L))) === (0L until 30L).toSet)
    // the commit is metadata + vectors only
    val h = TxLogTable.history(spark, t).filter("version = 4").collect().head
    assert(h.getAs[String]("action") === "dv")
    assert(h.getAs[Int]("n_added_files") === 0)
    // a no-match predicate commits nothing
    assert(TxLogTable.deleteVectors(spark, t, "k = 999") === 4L)
  }

  test("vectors stack across deletes and fastCount stays exact") {
    val t = rangedTable()
    TxLogTable.deleteVectors(spark, t, "k % 10 = 0")
    TxLogTable.deleteVectors(spark, t, "k % 10 = 1")
    val expect = (0L until 30L).filterNot(k => k % 10 == 0 || k % 10 == 1).toSet
    assert(keys(TxLogTable.read(spark, t)) === expect)
    assert(TxLogTable.fastCount(spark, t) === expect.size.toLong)
    // prunedRead composes with the mask
    assert(keys(TxLogTable.prunedRead(spark, t, "k", Some(10L), Some(19L))) ===
      expect.filter(k => k >= 10 && k <= 19))
  }

  test("copy-on-write rewrite applies and retires a file's vectors") {
    val t = rangedTable()
    TxLogTable.deleteVectors(spark, t, "k IN (1, 11, 21)")
    // cow-delete rows of the middle file only: its DV must be applied
    // (11 stays gone) and then retired with the file
    TxLogTable.delete(spark, t, "k = 15")
    val expect = (0L until 30L).toSet -- Set(1L, 11L, 21L, 15L)
    assert(keys(TxLogTable.read(spark, t)) === expect)
    // update through a DV'd file: masked row must not resurrect
    TxLogTable.update(spark, t, "k = 2", Map("v" -> "'upd'"))
    assert(keys(TxLogTable.read(spark, t)) === expect)
    assert(TxLogTable.read(spark, t).filter("k = 2").select("v")
      .head().getString(0) === "upd")
  }

  test("compact materializes the mask and restores the fast scan path") {
    val t = rangedTable()
    TxLogTable.deleteVectors(spark, t, "k % 3 = 0")
    assert(TxLogTable.scanSnapshot(spark, t, None).hasDeletionVectors)
    val expect = (0L until 30L).filterNot(_ % 3 == 0).toSet
    TxLogTable.compact(spark, t)
    assert(!TxLogTable.scanSnapshot(spark, t, None).hasDeletionVectors,
      "compaction must retire the vectors with the files")
    assert(keys(TxLogTable.read(spark, t)) === expect)
    // and the format read plans the plain file scan again
    assert(keys(spark.read.format("graft-txlog").load(t)) === expect)
  }

  test("format and catalog reads stay correct while vectors are outstanding") {
    val t = rangedTable()
    TxLogTable.deleteVectors(spark, t, "k >= 25")
    val expect = (0L until 25L).toSet
    assert(keys(spark.read.format("graft-txlog").load(t)) === expect)
    assert(keys(spark.read.format("graft-txlog")
      .option("versionAsOf", "3").load(t)) === (0L until 30L).toSet)
    // catalog surface over the same table dir
    val wh = Files.createTempDirectory("dv_cat_wh").toString
    spark.conf.set("spark.sql.catalog.gdv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdv.ns")
    val ct = s"$wh/ns/t"
    for (base <- Seq(0L, 10L, 20L))
      TxLogTable.append(
        (base until base + 10).map(i => (i, s"r$i")).toDF("k", "v").coalesce(1), ct)
    TxLogTable.deleteVectors(spark, ct, "k >= 25")
    assert(spark.sql("SELECT sum(k) AS s FROM gdv.ns.t").head().getLong(0) ===
      (0L until 25L).sum)
    assert(spark.sql("SELECT count(*) FROM gdv.ns.t VERSION AS OF 3")
      .head().getLong(0) === 30L)
  }

  test("change feed shows exactly the newly-masked rows") {
    val t = rangedTable()
    TxLogTable.deleteVectors(spark, t, "k % 10 = 5")     // v4: 3 deletes
    TxLogTable.deleteVectors(spark, t, "k % 10 = 5 OR k = 6") // v5: only k=6
    val feed = TxLogTable.changes(spark, t, 3L, 5L)
      .select("_commit_version", "_change_type", "k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(feed === Set((4L, "delete", 5L), (4L, "delete", 15L),
      (4L, "delete", 25L), (5L, "delete", 6L)),
      "already-masked rows must not re-appear in later dv versions")
  }

  test("restore and shallow clone carry the mask") {
    val t = rangedTable()
    TxLogTable.deleteVectors(spark, t, "k < 3")            // v4
    TxLogTable.delete(spark, t, "k >= 20")                 // v5 (cow)
    val expectV4 = (3L until 30L).toSet
    // restore to the dv version: mask must ride along
    val rv = TxLogTable.restore(spark, t, 4L)
    assert(keys(TxLogTable.read(spark, t)) === expectV4)
    assert(rv === 6L)
    // a shallow clone of a DV-bearing snapshot sees the masked rows
    val c = freshTable()
    TxLogTable.shallowClone(spark, t, c)
    assert(keys(TxLogTable.read(spark, c)) === expectV4)
    // and lives independently: cow-delete in the clone, source intact
    TxLogTable.delete(spark, c, "k >= 10")
    assert(keys(TxLogTable.read(spark, c)) === Set(3L, 4L, 5L, 6L, 7L, 8L, 9L))
    assert(keys(TxLogTable.read(spark, t)) === expectV4)
  }

  test("updateVectors masks old images and appends new ones in one commit") {
    val t = rangedTable()
    val filesBefore = dataFiles(t)
    val v = TxLogTable.updateVectors(spark, t, "k % 10 = 3",
      Map("v" -> "concat(v, '!')", "k" -> "k + 100"))
    assert(v === 4L)
    // no pre-existing file rewritten; exactly the new-image files added
    assert(filesBefore.subsetOf(dataFiles(t)))
    val got = TxLogTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val expect = (0L until 30L).map {
      case k if k % 10 == 3 => (k + 100, s"r$k!")
      case k                => (k, s"r$k")
    }.toSet
    assert(got === expect)
    // stacking on top of a delete vector; both masks compose
    TxLogTable.deleteVectors(spark, t, "k = 5")
    TxLogTable.updateVectors(spark, t, "k = 103", Map("v" -> "'again'"))
    val got2 = TxLogTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got2 === expect - ((5L, "r5")) - ((103L, "r3!")) + ((103L, "again")))
    // change feed of the update: delete(old) + insert(new) pairs
    val feed = TxLogTable.changes(spark, t, 3L, 4L)
      .select("_change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed === Set(("delete", 3L), ("delete", 13L), ("delete", 23L),
      ("insert", 103L), ("insert", 113L), ("insert", 123L)))
    // compact materializes everything; contents unchanged
    TxLogTable.compact(spark, t, smallFileBytes = 1L << 30)
    assert(!TxLogTable.scanSnapshot(spark, t, None).hasDeletionVectors)
    assert(TxLogTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === got2)
  }

  test("SqlDml resolves catalog-qualified UPDATE/DELETE without a path map") {
    val wh = Files.createTempDirectory("dml_cat_wh").toString
    spark.conf.set("spark.sql.catalog.gdml", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdml.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdml.ns")
    spark.sql("CREATE TABLE gdml.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gdml.ns.t SELECT id, concat('x', id) FROM range(0, 20)")
    graft.sql.SqlDml.run(spark, "UPDATE gdml.ns.t SET v = 'upd' WHERE k < 3")
    graft.sql.SqlDml.run(spark, "DELETE FROM gdml.ns.t WHERE k >= 15")
    val got = spark.sql("SELECT k, v FROM gdml.ns.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === 15)
    assert(got.take(3).forall(_._2 == "upd"))
    assert(got.drop(3).forall { case (k, v) => v == s"x$k" })
  }

  test("dv commits: fresh stream serves the masked snapshot; a mid-stream dv fails loudly") {
    val t = rangedTable()
    val ckpt = Files.createTempDirectory("dv_ckpt").toString
    val out = Files.createTempDirectory("dv_out").resolve("o").toString
    TxLogTable.deleteVectors(spark, t, "k = 7")
    // a FRESH stream's initial batch is the current snapshot — the
    // historical dv commit is already applied there (masked), so the
    // query runs and k=7 never reaches the sink
    def run(): Unit = {
      val q = spark.readStream.format("graft-txlog").load(t)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val streamed = spark.read.parquet(out).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(streamed === (0L until 30L).toSet - 7L,
      "initial batch must be the DV-masked snapshot")
    // a dv commit in the INCREMENTAL range is a row-level delete an
    // append-only stream cannot express: the restarted query owes
    // (snapshot..now] and must fail loudly, not skip the delete
    TxLogTable.deleteVectors(spark, t, "k = 3")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run()
    }
    assert(err.getMessage.contains("delete/update commit") ||
      Option(err.getCause).exists(_.getMessage.contains("delete/update commit")))
  }
}
