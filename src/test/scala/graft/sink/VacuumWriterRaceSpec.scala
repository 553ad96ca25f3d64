package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Vacuum × concurrent WRITER: a writer inside the move→claim window
  * of [[TxLogTable.write]] (files already moved into `data/`, commit
  * file not yet claimed) is invisible to the log — its files are
  * "orphans" by the referenced-set rule — and only the
  * `olderThanMillis` modification-time window keeps a concurrent
  * vacuum from deleting the data its imminent commit will name.
  * Proven here with a simulated mid-window file (fresh mtime,
  * unreferenced: the default window shields it, the adversarial
  * 0-window reclaims it — which is exactly why 0 is documented as
  * cold-maintenance-only), and with a live append loop racing a
  * vacuum loop. The default 10 minutes is load-bearing on object
  * stores beyond the move→claim latency itself: listing timestamps
  * there come from the STORE's clock, so the window must also absorb
  * clock skew between the store and the maintenance host — a skewed
  * store stamping fresh uploads minutes in the past would walk a
  * short window straight into live writers.
  */
class VacuumWriterRaceSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("vacrace").resolve("t").toString

  test("default window shields a mid-commit writer's moved-but-unclaimed files; 0 reclaims them") {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "a")).toDF("id", "v").coalesce(1), t)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a writer caught inside the move→claim window: a fresh
    // data file that no commit names YET (the state every writer
    // passes through between its data/ rename and its commit claim)
    val mid = new Path(t, "data/00000000000000000002-0-midflight.parquet")
    Seq((2L, "b")).toDF("id", "v").coalesce(1).write.parquet(s"$t/tmp_mid")
    val part = fs.listStatus(new Path(s"$t/tmp_mid"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, mid)
    fs.delete(new Path(s"$t/tmp_mid"), true)
    // default 10-minute window: the fresh unreferenced file SURVIVES —
    // repeatedly, since vacuum is idempotent over fresh orphans
    assert(TxLogTable.vacuum(spark, t) === 0)
    assert(TxLogTable.vacuum(spark, t) === 0)
    assert(fs.exists(mid), "a mid-window writer's file must survive vacuum")
    // adversarial case: olderThanMillis = 0 reclaims it IMMEDIATELY.
    // Had this been a live writer, its commit claim would name a
    // deleted file — 0 is safe only when no writer can be in flight.
    assert(TxLogTable.vacuum(spark, t, olderThanMillis = 0L) === 1)
    assert(!fs.exists(mid))
    // the committed snapshot is untouched under either window
    assert(TxLogTable.read(spark, t).count() === 1L)
  }

  test("vacuum loop racing live appends never loses a commit or a row") {
    val t = freshTable()
    TxLogTable.append(Seq((0L, "seed")).toDF("id", "v").coalesce(1), t)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val writer = new Thread(() => {
      try (1 to 5).foreach { i =>
        TxLogTable.append(Seq((i.toLong, s"r$i")).toDF("id", "v").coalesce(1), t)
      } catch { case e: Throwable => errs.add(e) }
    })
    writer.start()
    // hammer vacuum (default window) while the writer publishes —
    // every pass may observe some writer mid-stage or mid-claim. A
    // short pause between passes keeps this from busy-spinning the
    // driver thread against the append jobs on a loaded host (the
    // overlap is what the test needs, not the pass COUNT), and the
    // iteration bound keeps a wedged writer from hanging the suite.
    try {
      var passes = 0
      while (writer.isAlive && passes < 500) {
        TxLogTable.vacuum(spark, t); passes += 1; Thread.sleep(20)
      }
    } finally writer.join()
    TxLogTable.vacuum(spark, t)
    assert(errs.isEmpty, s"append failed under concurrent vacuum: ${errs.peek()}")
    val got = TxLogTable.read(spark, t).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L to 5L), "every racing append's rows must survive")
  }
}
