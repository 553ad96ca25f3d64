package graft.sink

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Randomized multi-writer stress: threads race append (with txn
  * idempotence and deliberate replays), compact, and vacuum against
  * one table. The converged table must equal the sequential
  * application of the unique (appId, epoch) batches — replays land
  * exactly once, compaction never changes contents, vacuum (with its
  * in-flight retention window) never reclaims a referenced or
  * about-to-be-committed file — and every committed version must stay
  * readable afterwards.
  */
class TxLogStressSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txstress").resolve("t").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("racing writers with replays, compaction and vacuum converge to the sequential result") {
    for (seed <- Seq(11, 47)) {
      val t = freshTable()
      val nWriters = 3
      val epochs = 5
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      def batch(app: Int, e: Int) =
        Seq((app * 1000L + e, s"w$app-e$e")).toDF("id", "v").coalesce(1)

      val threads = (1 to nWriters).map { app =>
        new Thread(() => {
          val rnd = new scala.util.Random(seed * 100 + app)
          try {
            for (e <- 1 to epochs) {
              TxLogTable.append(batch(app, e), t, txn = Some((s"app$app", e.toLong)))
              // replayed micro-batch: same (appId, epoch) → must no-op
              // even while other writers race new versions in
              if (rnd.nextInt(3) == 0)
                TxLogTable.append(batch(app, e), t, txn = Some((s"app$app", e.toLong)))
              // maintenance racing ingestion: a compaction losing to a
              // concurrent compaction aborts (documented; rerunnable)
              if (rnd.nextInt(4) == 0)
                try TxLogTable.compact(spark, t,
                  smallFileBytes = 1L << 20, targetFileBytes = 1L << 20)
                catch { case _: IllegalStateException => () }
              // vacuum with the default in-flight retention window:
              // must never touch files a live writer staged
              if (rnd.nextInt(4) == 0) TxLogTable.vacuum(spark, t)
            }
          } catch { case th: Throwable => errors.add(th) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(errors.isEmpty,
        s"seed=$seed writer errors: ${errors.asScala.map(_.toString).mkString("; ")}")

      val want = (for (a <- 1 to nWriters; e <- 1 to epochs)
        yield (a * 1000L + e, s"w$a-e$e")).toSet
      assert(rows(TxLogTable.read(spark, t)) === want, s"seed=$seed final contents")

      // vacuum reclaimed nothing a commit references: every committed
      // version still reads cleanly and never shows a row outside the
      // sequential universe
      for (v <- TxLogTable.versions(spark, t)) {
        val snap = rows(TxLogTable.read(spark, t, Some(v)))
        assert(snap.subsetOf(want), s"seed=$seed version $v leaked rows")
      }

      // a cold final vacuum (no writers in flight) removes at most
      // lost-race leftovers and must not change contents or history
      TxLogTable.vacuum(spark, t, olderThanMillis = 0L)
      assert(rows(TxLogTable.read(spark, t)) === want, s"seed=$seed post-vacuum")
      for (v <- TxLogTable.versions(spark, t))
        TxLogTable.read(spark, t, Some(v)).collect() // must not throw
    }
  }

  test("row-level DML racing appends, compaction and vacuum converges per-writer") {
    // each writer owns a disjoint id space and applies a sequential
    // program to it: append e=1..5, DELETE its e=2 row mid-stream,
    // UPDATE its e=4 row at the end. Cross-writer races only decide
    // COMMIT ORDER; a delete/update losing its copy-on-write race to
    // a concurrent compaction aborts cleanly and is retried — never
    // committing stale data. Expected final state is therefore the
    // per-writer sequential result, regardless of interleaving.
    for (seed <- Seq(7, 23)) {
      val t = freshTable()
      val nWriters = 3
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      def batch(app: Int, e: Int) =
        Seq((app * 1000L + e, s"w$app-e$e")).toDF("id", "v").coalesce(1)
      def retryRewrite(op: () => Long, what: String): Unit = {
        var done = false
        var tries = 0
        while (!done) {
          tries += 1
          if (tries > 25) throw new IllegalStateException(s"$what kept conflicting")
          try { op(); done = true }
          catch { case _: IllegalStateException => Thread.sleep(10) }
        }
      }
      val threads = (1 to nWriters).map { app =>
        new Thread(() => {
          val rnd = new scala.util.Random(seed * 10 + app)
          try {
            for (e <- 1 to 5) {
              TxLogTable.append(batch(app, e), t, txn = Some((s"dml$app", e.toLong)))
              if (e == 3) retryRewrite(
                () => TxLogTable.delete(spark, t, s"id = ${app * 1000 + 2}"),
                s"delete w$app")
              if (e == 4) retryRewrite(
                () => TxLogTable.merge(spark, t,
                  Seq((app * 1000L + 1, s"w$app-e1-merged"))
                    .toDF("id", "v"), "id"),
                s"merge w$app")
              if (rnd.nextInt(3) == 0)
                try TxLogTable.compact(spark, t,
                  smallFileBytes = 1L << 20, targetFileBytes = 1L << 20)
                catch { case _: IllegalStateException => () }
              if (rnd.nextInt(4) == 0) TxLogTable.vacuum(spark, t)
            }
            retryRewrite(
              () => TxLogTable.update(spark, t, s"id = ${app * 1000 + 4}",
                Map("v" -> "upper(v)")),
              s"update w$app")
          } catch { case th: Throwable => errors.add(th) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(errors.isEmpty,
        s"seed=$seed writer errors: ${errors.asScala.map(_.toString).mkString("; ")}")
      val want = (for (a <- 1 to nWriters; e <- Seq(1, 3, 4, 5)) yield {
        val v = e match {
          case 1 => s"w$a-e1-merged" // keyed merge replaced e=1 wholesale
          case 4 => s"w$a-e4".toUpperCase
          case _ => s"w$a-e$e"
        }
        (a * 1000L + e, v)
      }).toSet
      assert(rows(TxLogTable.read(spark, t)) === want, s"seed=$seed final contents")
      TxLogTable.vacuum(spark, t, olderThanMillis = 0L)
      assert(rows(TxLogTable.read(spark, t)) === want, s"seed=$seed post-vacuum")
      for (v <- TxLogTable.versions(spark, t))
        TxLogTable.read(spark, t, Some(v)).collect() // history stays readable
    }
  }

  test("commit contention at volume: 4 writers, 100+ commits with DVs and compaction interleaved") {
    // the round-7 write-write race fix, exercised at commit-log scale
    // rather than toy size: 4 writers × 25 epochs = 100 appends (every
    // one a contended claimCommit), with deletion vectors landing
    // every 5th epoch and compactions materializing masks mid-stream.
    // Every claim conflict must resolve to a unique version, replays
    // (txn idempotence) must stay exactly-once under contention, and
    // the converged table must equal the per-writer sequential result.
    val t = freshTable()
    val nWriters = 4
    val epochs = 25
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def batch(app: Int, e: Int) =
      Seq((app * 1000L + e, s"w$app-e$e")).toDF("id", "v").coalesce(1)
    def retryRewrite(op: () => Long, what: String): Unit = {
      var done = false
      var tries = 0
      while (!done) {
        tries += 1
        if (tries > 40) throw new IllegalStateException(s"$what kept conflicting")
        try { op(); done = true }
        catch { case _: IllegalStateException => Thread.sleep(10) }
      }
    }
    val threads = (1 to nWriters).map { app =>
      new Thread(() => {
        val rnd = new scala.util.Random(1000 + app)
        try {
          for (e <- 1 to epochs) {
            TxLogTable.append(batch(app, e), t, txn = Some((s"vol$app", e.toLong)))
            // replay under contention: must no-op exactly-once
            if (rnd.nextInt(5) == 0)
              TxLogTable.append(batch(app, e), t, txn = Some((s"vol$app", e.toLong)))
            // merge-on-read delete of the previous multiple-of-5 epoch
            if (e % 5 == 0) retryRewrite(
              () => TxLogTable.deleteVectors(spark, t, s"id = ${app * 1000 + e}"),
              s"vol-dv w$app-e$e")
            if (rnd.nextInt(8) == 0)
              try TxLogTable.compact(spark, t,
                smallFileBytes = 1L << 20, targetFileBytes = 1L << 20)
              catch { case _: IllegalStateException => () }
          }
        } catch { case th: Throwable => errors.add(th) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty,
      s"writer errors: ${errors.asScala.map(_.toString).mkString("; ")}")

    val versions = TxLogTable.versions(spark, t)
    assert(versions.size >= 100,
      s"expected >= 100 committed versions, got ${versions.size}")
    // versions are a gap-free claim sequence — no lost or double claim
    assert(versions.sorted === (1L to versions.size.toLong),
      "committed versions are not a contiguous 1..n sequence")

    val want = (for (a <- 1 to nWriters; e <- 1 to epochs if e % 5 != 0)
      yield (a * 1000L + e, s"w$a-e$e")).toSet
    assert(rows(TxLogTable.read(spark, t)) === want, "final contents")

    // history stays readable and inside the sequential universe
    TxLogTable.vacuum(spark, t, olderThanMillis = 0L)
    assert(rows(TxLogTable.read(spark, t)) === want, "post-vacuum contents")
    for (v <- versions)
      TxLogTable.read(spark, t, Some(v)).collect() // must not throw
  }

  test("merge-on-read DML racing appends, compaction and vacuum converges per-writer") {
    // same per-writer program as the copy-on-write race, but the
    // row-level ops are DELETION VECTORS (deleteVectors/updateVectors)
    // while random compactions MATERIALIZE outstanding masks
    // mid-stream. A vector computed against a snapshot whose files a
    // concurrent rewrite replaced aborts cleanly (row indexes are
    // per-file) and is retried; masked rows must never resurrect
    // through any interleaving, and vacuum must never reclaim a
    // referenced vector directory.
    for (seed <- Seq(13, 31)) {
      val t = freshTable()
      val nWriters = 3
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      def batch(app: Int, e: Int) =
        Seq((app * 1000L + e, s"w$app-e$e")).toDF("id", "v").coalesce(1)
      def retryRewrite(op: () => Long, what: String): Unit = {
        var done = false
        var tries = 0
        while (!done) {
          tries += 1
          if (tries > 25) throw new IllegalStateException(s"$what kept conflicting")
          try { op(); done = true }
          catch { case _: IllegalStateException => Thread.sleep(10) }
        }
      }
      val threads = (1 to nWriters).map { app =>
        new Thread(() => {
          val rnd = new scala.util.Random(seed * 10 + app)
          try {
            for (e <- 1 to 5) {
              TxLogTable.append(batch(app, e), t, txn = Some((s"dv$app", e.toLong)))
              if (e == 3) retryRewrite(
                () => TxLogTable.deleteVectors(spark, t, s"id = ${app * 1000 + 2}"),
                s"dv-delete w$app")
              if (rnd.nextInt(3) == 0)
                try TxLogTable.compact(spark, t,
                  smallFileBytes = 1L << 20, targetFileBytes = 1L << 20)
                catch { case _: IllegalStateException => () }
              if (rnd.nextInt(4) == 0) TxLogTable.vacuum(spark, t)
            }
            retryRewrite(
              () => TxLogTable.updateVectors(spark, t, s"id = ${app * 1000 + 4}",
                Map("v" -> "upper(v)")),
              s"dv-update w$app")
          } catch { case th: Throwable => errors.add(th) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(errors.isEmpty,
        s"seed=$seed writer errors: ${errors.asScala.map(_.toString).mkString("; ")}")
      val want = (for (a <- 1 to nWriters; e <- Seq(1, 3, 4, 5)) yield {
        val v = if (e == 4) s"w$a-e4".toUpperCase else s"w$a-e$e"
        (a * 1000L + e, v)
      }).toSet
      assert(rows(TxLogTable.read(spark, t)) === want, s"seed=$seed final contents")
      TxLogTable.compact(spark, t, smallFileBytes = 1L << 30) // settle any mask
      TxLogTable.vacuum(spark, t, olderThanMillis = 0L)
      assert(rows(TxLogTable.read(spark, t)) === want, s"seed=$seed post-settle")
      for (v <- TxLogTable.versions(spark, t))
        TxLogTable.read(spark, t, Some(v)).collect() // history stays readable
    }
  }
}
