package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Multi-part checkpoints: at 100 TB a snapshot's checkpoint is
  * millions of lines — the writer splits it into capped part files
  * behind a manifest, the reader reassembles, and a torn part falls
  * back to replay exactly like a torn single-file checkpoint.
  */
class MultiPartCheckpointSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("mpckpt").resolve("t").toString

  private def fs(t: String) =
    new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(t: String): Set[(Long, String)] =
    TxLogTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def expected(n: Int): Set[(Long, String)] =
    (1 to n).map(i => (i.toLong, s"r$i")).toSet

  test("a tiny part cap splits the checkpoint; state round-trips exactly") {
    val t = freshTable()
    for (i <- 1 to 7)
      TxLogTable.append(Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1), t)
    TxLogTable.setProperties(spark, t, Map("tier" -> "bronze"))
    TxLogTable.addConstraint(spark, t, "id_pos", "id > 0")
    val v = TxLogTable.checkpoint(spark, t, maxPartLines = 4)
    val f = fs(t)
    val manifest = new Path(t, f"_txlog/$v%020d.checkpoint.txt")
    assert(f.exists(manifest))
    val manifestText = {
      val in = f.open(manifest)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    assert(manifestText.startsWith("parts="),
      s"expected a manifest, got: ${manifestText.take(40)}")
    val nParts = manifestText.linesIterator.next().stripPrefix("parts=").toInt
    assert(nParts >= 2, "a 7-file snapshot at cap 4 must split")
    for (i <- 0 until nParts)
      assert(f.exists(new Path(t,
        f"_txlog/$v%020d.checkpoint.part-$i%05d.txt")))
    // the checkpoint is actually USED: expire all pre-checkpoint
    // commits, state must still resolve (files, stats, constraints,
    // properties)
    for (w <- 1L until v)
      assert(f.delete(new Path(t, f"_txlog/$w%020d.txt"), false))
    assert(rows(t) === expected(7))
    assert(TxLogTable.properties(spark, t) === Map("tier" -> "bronze"))
    assert(TxLogTable.constraints(spark, t) === Map("id_pos" -> "id > 0"))
    assert(TxLogTable.prunedRead(spark, t, "id",
      lower = Some(3L), upper = Some(3L)).collect()
      .map(_.getLong(0)).toSet === Set(3L),
      "per-file stats must survive the multi-part roundtrip")
    // appends keep working on top of the reassembled state
    TxLogTable.append(Seq((8L, "r8")).toDF("id", "v").coalesce(1), t)
    assert(rows(t) === expected(8))
  }

  test("a torn part falls back to replay, never a wrong answer") {
    val t = freshTable()
    for (i <- 1 to 6)
      TxLogTable.append(Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1), t)
    val v = TxLogTable.checkpoint(spark, t, maxPartLines = 3)
    val f = fs(t)
    val part0 = new Path(t, f"_txlog/$v%020d.checkpoint.part-00000.txt")
    assert(f.exists(part0))
    // truncate part 0: drop its end marker
    val full = {
      val in = f.open(part0)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    f.delete(part0, false)
    val out = f.create(part0, true)
    try out.write(full.stripSuffix("end=1\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // commits are all still present → full replay serves the truth
    assert(rows(t) === expected(6))
    // a MISSING part behaves the same
    f.delete(part0, false)
    assert(rows(t) === expected(6))
  }

  test("below the cap the single-file wire format is unchanged") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "r1")).toDF("id", "v").coalesce(1), t)
    val v = TxLogTable.checkpoint(spark, t) // default cap
    val f = fs(t)
    val main = new Path(t, f"_txlog/$v%020d.checkpoint.txt")
    val text = {
      val in = f.open(main)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    assert(text.startsWith("schema="), "single-file form must be kept")
    assert(!text.contains("parts="))
    assert(rows(t) === expected(1))
  }
}
