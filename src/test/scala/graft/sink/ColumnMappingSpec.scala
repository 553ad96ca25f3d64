package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Column mapping: RENAME COLUMN as a metadata-only commit. Data
  * files keep their physical names forever; every read surface serves
  * the logical names, every write/predicate surface accepts them.
  */
class ColumnMappingSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("colmap").resolve("t").toString

  private def fs(t: String) =
    new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(t: String): Set[String] = {
    val d = new Path(t, "data")
    val f = fs(t)
    if (!f.exists(d)) Set.empty
    else f.listStatus(d).map(_.getPath.getName).toSet
  }

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select("id", "seg").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("rename is metadata-only and read serves the new name") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A", 10L), (2L, "B", 20L)).toDF("k", "seg", "bal"), t)
    val before = dataFiles(t)
    val v = TxLogTable.renameColumn(spark, t, "k", "id")
    assert(v === 2L)
    assert(dataFiles(t) === before, "rename moved data bytes")
    assert(TxLogTable.read(spark, t).columns.toSeq === Seq("id", "seg", "bal"))
    assert(rows(TxLogTable.read(spark, t)) === Set((1L, "A"), (2L, "B")))
    assert(TxLogTable.columnMapping(spark, t) === Map("k" -> "id"))
    // time travel is faithful: the pre-rename version serves old names
    assert(TxLogTable.read(spark, t, Some(1L)).columns.toSeq ===
      Seq("k", "seg", "bal"))
  }

  test("appends after a rename use logical names; files stay physical") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A", 10L)).toDF("k", "seg", "bal"), t)
    TxLogTable.renameColumn(spark, t, "k", "id")
    TxLogTable.append(Seq((3L, "C", 30L)).toDF("id", "seg", "bal"), t)
    assert(rows(TxLogTable.read(spark, t)) === Set((1L, "A"), (3L, "C")))
    // the new data file carries the PHYSICAL column name
    val newest = dataFiles(t).toSeq.sorted
    val physCols = newest.flatMap { n =>
      spark.read.parquet(s"$t/data/$n").columns.toSeq
    }.toSet
    assert(physCols === Set("k", "seg", "bal"),
      s"a file leaked logical names: $physCols")
    // and an append under the OLD name no longer matches
    val e = intercept[IllegalArgumentException] {
      TxLogTable.append(Seq((4L, "D", 40L)).toDF("k", "seg", "bal"), t)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("rename chains, swaps via a temp name, and rename-back clears the map") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A", 10L)).toDF("a", "seg", "b"), t)
    TxLogTable.renameColumn(spark, t, "a", "tmp")
    TxLogTable.renameColumn(spark, t, "b", "a")
    TxLogTable.renameColumn(spark, t, "tmp", "b") // full swap a <-> b
    assert(TxLogTable.read(spark, t).columns.toSeq === Seq("b", "seg", "a"))
    assert(TxLogTable.columnMapping(spark, t) === Map("a" -> "b", "b" -> "a"))
    val r = TxLogTable.read(spark, t).select("b", "a").head()
    assert((r.getLong(0), r.getLong(1)) === (1L, 10L))
    // DML and appends under the SWAPPED names translate exactly once
    TxLogTable.append(Seq((2L, "B", 20L)).toDF("b", "seg", "a"), t)
    TxLogTable.update(spark, t, "b = 1", Map("a" -> "a + 1"))
    val got = TxLogTable.read(spark, t).select("b", "seg", "a").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    assert(got === Set((1L, "A", 11L), (2L, "B", 20L)))
    // undo the swap → identity mapping drops out entirely
    TxLogTable.renameColumn(spark, t, "b", "tmp")
    TxLogTable.renameColumn(spark, t, "a", "b")
    TxLogTable.renameColumn(spark, t, "tmp", "a")
    assert(TxLogTable.columnMapping(spark, t) === Map.empty)
  }

  test("rename validations: unknown, collision, constraint reference") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A", 10L)).toDF("k", "seg", "bal"), t)
    assert(intercept[IllegalArgumentException](
      TxLogTable.renameColumn(spark, t, "nope", "x"))
      .getMessage.contains("no such column"))
    assert(intercept[IllegalArgumentException](
      TxLogTable.renameColumn(spark, t, "k", "seg"))
      .getMessage.contains("already exists"))
    TxLogTable.addConstraint(spark, t, "pos_bal", "bal >= 0")
    assert(intercept[IllegalArgumentException](
      TxLogTable.renameColumn(spark, t, "bal", "cents"))
      .getMessage.contains("pos_bal"))
    // unrelated columns still rename, and the constraint still gates
    TxLogTable.renameColumn(spark, t, "k", "id")
    val bad = intercept[TxLogTable.ConstraintViolation](
      TxLogTable.append(Seq((2L, "B", -5L)).toDF("id", "seg", "bal"), t))
    assert(bad.getMessage.contains("pos_bal"))
  }

  test("stats pruning answers predicates on the renamed column") {
    val t = freshTable()
    // three clustered appends → three files with disjoint k ranges
    Seq(0L, 100L, 200L).foreach { base =>
      TxLogTable.append(
        (base until base + 100L).map(i => (i, s"s$i")).toDF("k", "seg"), t)
    }
    TxLogTable.renameColumn(spark, t, "k", "id")
    val cand = TxLogTable.candidateFiles(spark, t, "id",
      lower = Some(120L), upper = Some(130L))
    assert(cand.size === 1, s"expected 1 candidate file, got $cand")
    val pr = TxLogTable.prunedRead(spark, t, "id",
      lower = Some(120L), upper = Some(130L))
    assert(pr.count() === 11L)
    assert(pr.columns.contains("id"))
  }

  test("DML under logical names: delete, update, merge, vectors, CDF") {
    val t = freshTable()
    TxLogTable.append(
      (1L to 10L).map(i => (i, if (i % 2 == 0) "EVEN" else "ODD", i * 10L))
        .toDF("k", "par", "bal"), t)
    TxLogTable.renameColumn(spark, t, "par", "parity")
    TxLogTable.renameColumn(spark, t, "bal", "cents")
    // copy-on-write delete with a logical predicate
    TxLogTable.delete(spark, t, "parity = 'EVEN' AND cents >= 80")
    assert(TxLogTable.read(spark, t).count() === 8L)
    // copy-on-write update assigning a logical column
    TxLogTable.update(spark, t, "k = 1", Map("cents" -> "cents + 5"))
    assert(TxLogTable.read(spark, t).filter(col("k") === 1L)
      .head().getAs[Long]("cents") === 15L)
    // merge-on-read vectors with logical names
    TxLogTable.deleteVectors(spark, t, "parity = 'ODD' AND k >= 9")
    assert(TxLogTable.read(spark, t).count() === 7L)
    TxLogTable.updateVectors(spark, t, "k = 3", Map("cents" -> "0"))
    assert(TxLogTable.read(spark, t).filter(col("k") === 3L)
      .head().getAs[Long]("cents") === 0L)
    // keyed merge under the logical view
    TxLogTable.merge(spark, t,
      Seq((5L, "ODD", 999L), (50L, "NEW", 1L)).toDF("k", "parity", "cents"), "k")
    val after = TxLogTable.read(spark, t)
    assert(after.filter(col("k") === 5L).head().getAs[Long]("cents") === 999L)
    assert(after.filter(col("k") === 50L).count() === 1L)
    // the change feed serves logical names end to end
    val feed = TxLogTable.changes(spark, t, 0L,
      TxLogTable.versions(spark, t).max)
    assert(feed.columns.contains("parity") && feed.columns.contains("cents"))
    assert(!feed.columns.contains("par") && !feed.columns.contains("bal"))
    // identity: snapshot == inserts minus deletes, under logical names
    val ins = feed.filter(col("_change_type") === "insert")
      .select("k", "parity", "cents")
    val del = feed.filter(col("_change_type") === "delete")
      .select("k", "parity", "cents")
    val replayed = ins.exceptAll(del).collect().toSet
    val snap = after.select("k", "parity", "cents").collect().toSet
    assert(replayed === snap)
  }

  test("checkpoint, restore and shallow clone carry the mapping") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A")).toDF("k", "seg"), t)
    TxLogTable.renameColumn(spark, t, "k", "id")
    val renamedV = TxLogTable.versions(spark, t).max
    // state reloaded through a checkpoint still maps
    TxLogTable.checkpoint(spark, t)
    TxLogTable.append(Seq((2L, "B")).toDF("id", "seg"), t)
    assert(TxLogTable.read(spark, t).columns.head === "id")
    // restore to the renamed version keeps the mapping
    TxLogTable.renameColumn(spark, t, "id", "key")
    TxLogTable.restore(spark, t, renamedV)
    assert(TxLogTable.read(spark, t).columns.head === "id")
    assert(TxLogTable.columnMapping(spark, t) === Map("k" -> "id"))
    // a shallow clone starts life with the source's mapping
    val c = freshTable()
    TxLogTable.shallowClone(spark, t, c)
    assert(TxLogTable.read(spark, c).columns.head === "id")
    assert(rows2(TxLogTable.read(spark, c)) === Set((1L, "A")))
  }

  private def rows2(df: DataFrame): Set[(Long, String)] =
    df.select("id", "seg").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("format and catalog surfaces serve the logical view") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A", 10L), (2L, "B", 20L))
      .toDF("k", "seg", "bal"), t)
    TxLogTable.renameColumn(spark, t, "bal", "cents")
    // format read bridges to the logical plan
    val f = spark.read.format("graft-txlog").load(t)
    assert(f.columns.toSeq === Seq("k", "seg", "cents"))
    assert(f.filter(col("cents") >= 20L).count() === 1L)
    // pre-rename time travel through the format serves old names
    val f1 = spark.read.format("graft-txlog").option("versionAsOf", "1").load(t)
    assert(f1.columns.toSeq === Seq("k", "seg", "bal"))
    // catalog SQL: ALTER TABLE RENAME COLUMN + reads + DML
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.warehouse",
        Files.createTempDirectory("colmap_wh").toString)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cm")
    val name = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE graft.cm.$name (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO graft.cm.$name VALUES (1, 'x'), (2, 'y')")
    spark.sql(s"ALTER TABLE graft.cm.$name RENAME COLUMN v TO label")
    val out = spark.sql(s"SELECT k, label FROM graft.cm.$name ORDER BY k")
    assert(out.columns.toSeq === Seq("k", "label"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x"), (2L, "y")))
    spark.sql(s"DELETE FROM graft.cm.$name WHERE label = 'x'")
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.cm.$name").head().getLong(0) === 1L)
  }

  test("drop column is metadata-only; re-add gets a fresh physical slot") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A", 10L), (2L, "B", 20L))
      .toDF("k", "seg", "bal"), t)
    val before = dataFiles(t)
    val v = TxLogTable.dropColumn(spark, t, "bal")
    assert(v === 2L)
    assert(dataFiles(t) === before, "drop moved data bytes")
    assert(TxLogTable.read(spark, t).columns.toSeq === Seq("k", "seg"))
    // time travel still serves the column
    assert(TxLogTable.read(spark, t, Some(1L)).columns.toSeq ===
      Seq("k", "seg", "bal"))
    // appends now use the narrower schema
    TxLogTable.append(Seq((3L, "C")).toDF("k", "seg"), t)
    assert(TxLogTable.read(spark, t).count() === 3L)
    // re-adding 'bal' allocates a FRESH physical slot: the old bytes
    // (10, 20) must NOT resurrect — all rows read NULL
    TxLogTable.addColumns(spark, t,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bal",
          org.apache.spark.sql.types.LongType))))
    val re = TxLogTable.read(spark, t)
    assert(re.columns.toSeq === Seq("k", "seg", "bal"))
    assert(re.filter(col("bal").isNotNull).count() === 0L,
      "dropped bytes resurrected into the re-added column")
    // the fresh slot is real: writes land under it and read back
    TxLogTable.append(Seq((4L, "D", 40L)).toDF("k", "seg", "bal"), t)
    assert(TxLogTable.read(spark, t).filter(col("bal") === 40L).count() === 1L)
    // and the physical parquet never carries the logical name 'bal'
    val physCols = dataFiles(t).flatMap(n =>
      spark.read.parquet(s"$t/data/$n").columns.toSeq)
    assert(physCols.count(_ == "bal") === 1, // only the ORIGINAL v1 file
      s"expected exactly the pre-drop file to carry 'bal': $physCols")
    // appendEvolve refuses to re-add a tombstoned name itself
    TxLogTable.dropColumn(spark, t, "bal")
    val e = intercept[IllegalArgumentException] {
      TxLogTable.appendEvolve(Seq((5L, "E", 50L)).toDF("k", "seg", "bal"), t)
    }
    assert(e.getMessage.contains("fresh physical slot"))
  }

  test("drop validations and SQL DROP COLUMN through the catalog") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A")).toDF("k", "seg"), t)
    TxLogTable.addConstraint(spark, t, "seg_set", "seg IS NOT NULL")
    assert(intercept[IllegalArgumentException](
      TxLogTable.dropColumn(spark, t, "seg"))
      .getMessage.contains("seg_set"))
    assert(intercept[IllegalArgumentException](
      TxLogTable.dropColumn(spark, t, "nope"))
      .getMessage.contains("no such column"))
    // dropping a RENAMED column tombstones its PHYSICAL slot
    TxLogTable.renameColumn(spark, t, "k", "id")
    TxLogTable.dropColumn(spark, t, "id")
    assert(TxLogTable.read(spark, t).columns.toSeq === Seq("seg"))
    assert(TxLogTable.columnMapping(spark, t) === Map.empty)
    // catalog SQL surface
    if (spark.conf.getOption("spark.sql.catalog.graft").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.warehouse",
        Files.createTempDirectory("colmap_wh2").toString)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cm2")
    val name = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE TABLE graft.cm2.$name (k BIGINT, v STRING, w BIGINT)")
    spark.sql(s"INSERT INTO graft.cm2.$name VALUES (1, 'x', 7)")
    spark.sql(s"ALTER TABLE graft.cm2.$name DROP COLUMN w")
    val out = spark.sql(s"SELECT * FROM graft.cm2.$name")
    assert(out.columns.toSeq === Seq("k", "v"))
    assert(out.head().getLong(0) === 1L)
  }

  test("materializeColumns clears the mapping and restores the V2 fast path") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A", 10L), (2L, "B", 20L))
      .toDF("k", "seg", "bal"), t)
    TxLogTable.renameColumn(spark, t, "bal", "cents")
    TxLogTable.addConstraint(spark, t, "pos", "cents >= 0")
    TxLogTable.setProperties(spark, t, Map("tier" -> "gold"))
    // mapped table: format read is the bridged (non-file-scan) plan
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    assert(!planOf(spark.read.format("graft-txlog").load(t))
      .contains("FileScan"), "mapped table must bridge")
    val preV = TxLogTable.versions(spark, t).max
    val v = TxLogTable.materializeColumns(spark, t)
    assert(v === preV + 1)
    // mapping + tombstones gone; contents identical under logical names
    assert(TxLogTable.columnMapping(spark, t) === Map.empty)
    val re = TxLogTable.read(spark, t)
    assert(re.columns.toSeq === Seq("k", "seg", "cents"))
    assert(re.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet === Set((1L, "A", 10L), (2L, "B", 20L)))
    // fast path returns: the format read is a real file scan again
    assert(planOf(spark.read.format("graft-txlog").load(t))
      .contains("FileScan"), "materialized table must take the fast path")
    // table-level metadata survived the rewrite
    assert(TxLogTable.constraints(spark, t) === Map("pos" -> "cents >= 0"))
    assert(TxLogTable.properties(spark, t) === Map("tier" -> "gold"))
    // the constraint still gates under the (now physical) logical name
    intercept[TxLogTable.ConstraintViolation] {
      TxLogTable.append(Seq((3L, "C", -1L)).toDF("k", "seg", "cents"), t)
    }
    // history preserved: the pre-materialize version serves old names
    assert(TxLogTable.read(spark, t, Some(1L)).columns.toSeq ===
      Seq("k", "seg", "bal"))
    // no-op on an unmapped table
    assert(TxLogTable.materializeColumns(spark, t) === v)
  }

  test("evolution cannot shadow a logical name; compact keeps the mapping") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "A")).toDF("k", "seg"), t)
    TxLogTable.renameColumn(spark, t, "k", "id")
    assert(intercept[IllegalArgumentException](
      TxLogTable.addColumns(spark, t,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType)))))
      .getMessage.contains("already exist"))
    // appends then compact: contents and mapping survive the rewrite
    TxLogTable.append(Seq((2L, "B")).toDF("id", "seg"), t)
    TxLogTable.append(Seq((3L, "C")).toDF("id", "seg"), t)
    TxLogTable.compact(spark, t, clusterBy = Some("id"))
    assert(rows2(TxLogTable.read(spark, t)) ===
      Set((1L, "A"), (2L, "B"), (3L, "C")))
    assert(TxLogTable.columnMapping(spark, t) === Map("k" -> "id"))
  }
}
