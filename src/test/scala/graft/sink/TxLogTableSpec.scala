package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** The version-log ACID table: commit atomicity, time travel, schema
  * discipline, race behavior, and orphan reclamation.
  */
class TxLogTableSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txlog").resolve("t").toString

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("append / overwrite / append replays to the right snapshots") {
    val t = freshTable()
    val v1 = TxLogTable.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val v2 = TxLogTable.overwrite(Seq((3L, "c")).toDF("id", "v"), t)
    val v3 = TxLogTable.append(Seq((4L, "d")).toDF("id", "v"), t)
    assert((v1, v2, v3) === (1L, 2L, 3L))
    assert(TxLogTable.versions(spark, t) === Seq(1L, 2L, 3L))
    assert(rows(TxLogTable.read(spark, t, Some(1L))) === Set((1L, "a"), (2L, "b")))
    assert(rows(TxLogTable.read(spark, t, Some(2L))) === Set((3L, "c")))
    assert(rows(TxLogTable.read(spark, t)) === Set((3L, "c"), (4L, "d")))
  }

  test("staged-but-uncommitted data is invisible and vacuum reclaims it") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v"), t)
    // simulate a crashed writer: a data file present but named by no commit
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new Path(t, "data/00000000000000000099-0-dead.parquet")
    Seq((99L, "zz")).toDF("id", "v").coalesce(1).write.parquet(s"$t/tmp_orphan")
    val part = fs.listStatus(new Path(s"$t/tmp_orphan"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, orphan)
    fs.delete(new Path(s"$t/tmp_orphan"), true)

    assert(rows(TxLogTable.read(spark, t)) === Set((1L, "a")), "orphan leaked into a read")
    assert(TxLogTable.vacuum(spark, t) === 1)
    assert(!fs.exists(orphan))
    assert(rows(TxLogTable.read(spark, t)) === Set((1L, "a")))
    assert(TxLogTable.vacuum(spark, t) === 0, "vacuum must not touch referenced files")
  }

  test("a lost commit race retries under the next version without duplicating data") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v"), t)
    // occupy version 2 as a concurrent writer would
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stolen = new Path(t, "_txlog/00000000000000000002.txt")
    val out = fs.create(stolen, false)
    val ddl = Seq((9L, "x")).toDF("id", "v").schema.toDDL
    out.write(s"action=append\nschema=$ddl\n".getBytes("UTF-8"))
    out.close()

    val v = TxLogTable.append(Seq((2L, "b")).toDF("id", "v"), t)
    assert(v === 3L, "writer should have bumped past the stolen version")
    assert(rows(TxLogTable.read(spark, t)) === Set((1L, "a"), (2L, "b")))
    // the retry re-published the SAME files under the next version:
    // nothing is duplicated and nothing was abandoned
    assert(TxLogTable.vacuum(spark, t) === 0,
      "lost-race retry left orphaned data files")
    assert(rows(TxLogTable.read(spark, t, Some(1L))) === Set((1L, "a")))
  }

  test("append enforces the committed schema; overwrite may evolve it") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v"), t)
    val bad = intercept[IllegalArgumentException] {
      TxLogTable.append(Seq((1L, 2L)).toDF("id", "n"), t)
    }
    assert(bad.getMessage.contains("schema mismatch"))
    TxLogTable.overwrite(Seq((1L, 7L)).toDF("id", "n"), t)
    val got = TxLogTable.read(spark, t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 7L)))
    // old snapshot still reads under the OLD schema
    assert(rows(TxLogTable.read(spark, t, Some(1L))) === Set((1L, "a")))
  }

  test("empty overwrite keeps the table readable with its schema") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v"), t)
    TxLogTable.overwrite(Seq.empty[(Long, String)].toDF("id", "v"), t)
    val snap = TxLogTable.read(spark, t)
    assert(snap.count() === 0L)
    assert(snap.schema.fieldNames.toSeq === Seq("id", "v"))
  }

  test("merge commits a copy-on-write upsert as a new version") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    val v = TxLogTable.merge(spark, t, Seq((2L, "B"), (3L, "c")).toDF("id", "v"), "id")
    assert(v === 2L)
    assert(rows(TxLogTable.read(spark, t)) === Set((1L, "a"), (2L, "B"), (3L, "c")))
    assert(rows(TxLogTable.read(spark, t, Some(1L))) === Set((1L, "a"), (2L, "b")),
      "merge must not rewrite history")
  }

  test("reading a missing version or a non-table fails loudly") {
    val t = freshTable()
    intercept[IllegalArgumentException](TxLogTable.read(spark, t))
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v"), t)
    intercept[IllegalArgumentException](TxLogTable.read(spark, t, Some(9L)))
  }
}
