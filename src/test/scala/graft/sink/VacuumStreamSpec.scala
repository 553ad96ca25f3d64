package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Vacuum × stream interaction: [[TxLogTable.vacuum]] reclaims only
  * files referenced by NO commit, so the committed appends a stream
  * still owes can never be deleted out from under its next
  * micro-batch — the `olderThanMillis` window protects in-flight
  * WRITERS (staged-but-uncommitted files), not readers. Proven here
  * with a stream paused across an orphan-reclaiming vacuum (plus a
  * compaction that supersedes the owed files, the closest thing to a
  * threat), and with vacuums landing between the micro-batches of a
  * LIVE stream.
  */
class VacuumStreamSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("vacstream").resolve("t").toString

  private def plantOrphan(t: String): Path = {
    // simulate a crashed writer: a data file named by no commit
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new Path(t, "data/00000000000000000099-0-dead.parquet")
    Seq((99L, "zz")).toDF("id", "v").coalesce(1).write.parquet(s"$t/tmp_orphan")
    val part = fs.listStatus(new Path(s"$t/tmp_orphan"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, orphan)
    fs.delete(new Path(s"$t/tmp_orphan"), true)
    orphan
  }

  test("stream paused across compact + vacuum resumes exactly-once; only the orphan is reclaimed") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v").coalesce(1), t)
    val ckpt = Files.createTempDirectory("vacstream_ckpt").toString
    val out = Files.createTempDirectory("vacstream_out").resolve("o").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-txlog").load(t)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() === 1L)
    // two committed appends the paused stream still owes, then a
    // compaction that supersedes their files in the CURRENT snapshot
    // (they stay committed history — the commits the resumed stream
    // replays still name them) and an old orphan vacuum SHOULD take
    TxLogTable.append(Seq((2L, "b")).toDF("id", "v").coalesce(1), t)
    TxLogTable.append(Seq((3L, "c")).toDF("id", "v").coalesce(1), t)
    TxLogTable.compact(spark, t)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = plantOrphan(t)
    assert(TxLogTable.vacuum(spark, t, olderThanMillis = 0L) === 1,
      "vacuum must reclaim exactly the planted orphan")
    assert(!fs.exists(orphan))
    run() // resume on the same checkpoint, across the vacuum
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === 3,
      s"exactly-once resume across vacuum, got ${got.mkString(",")}")
    assert(got.toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("vacuum between micro-batches leaves a LIVE stream undisturbed") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v").coalesce(1), t)
    val out = Files.createTempDirectory("vacstream_out2").resolve("o").toString
    val q = spark.readStream.format("graft-txlog").load(t)
      .writeStream.format("parquet")
      .option("checkpointLocation",
        Files.createTempDirectory("vacstream_ckpt2").toString)
      .option("path", out).start()
    try {
      q.processAllAvailable()
      TxLogTable.append(Seq((2L, "b")).toDF("id", "v").coalesce(1), t)
      // nothing is unreferenced: even with a zero window, a vacuum
      // racing the live stream finds no file to delete
      assert(TxLogTable.vacuum(spark, t, olderThanMillis = 0L) === 0)
      q.processAllAvailable()
      TxLogTable.append(Seq((3L, "c")).toDF("id", "v").coalesce(1), t)
      assert(TxLogTable.vacuum(spark, t, olderThanMillis = 0L) === 0)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === 3, s"exactly-once, got ${got.mkString(",")}")
    assert(got.toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
