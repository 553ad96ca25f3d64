package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0)).toDF("id", "name", "bal")

  test("upsert: updates win on collision, inserts append, untouched rows pass through") {
    val changes = Seq(
      (2L, "bob2", 25.0),   // update
      (9L, "zoe", 99.0))    // insert
      .toDF("id", "name", "bal")
    val out = Merge.upsert(base, changes, "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === Set(
      (1L, "alice", 10.0), (2L, "bob2", 25.0), (3L, "carol", 30.0), (9L, "zoe", 99.0)))
  }

  test("upsert: a matched update row wins wholesale, including NULL fields") {
    val changes = Seq((2L, Option.empty[String], 25.0)).toDF("id", "name", "bal")
    val row = Merge.upsert(base, changes, "id")
      .filter(col("id") === 2L).collect().head
    assert(row.isNullAt(1), "update's NULL name must overwrite base's 'bob'")
    assert(row.getDouble(2) === 25.0)
  }

  test("upsert: empty change batch is identity") {
    val out = Merge.upsert(base, base.limit(0), "id")
    assert(out.collect().length === 3)
    assert(out.columns.toSeq === base.columns.toSeq)
  }

  test("upsert: schema preserved in base column order") {
    val changes = Seq((1L, "x", 0.0)).toDF("id", "name", "bal")
    assert(Merge.upsert(base, changes, "id").columns.toSeq === Seq("id", "name", "bal"))
  }

  test("applyChangeLog: one-pass fold equals applying each version batch in seq order") {
    // random multi-version logs: per trial, a base of ~keys and a log
    // where each key gets 0..4 versions (upsert or delete) at unique
    // seqs; the one-pass fold must equal the sequential ground truth
    // (apply seq-1 batch, then seq-2, ...: upserts overwrite/insert,
    // deletes remove)
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 5) {
      val nKeys = 30 + rnd.nextInt(50)
      val baseRows = (1 to nKeys).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, rnd.nextInt(1000).toLong))
      val maxSeq = 4
      val logRows = (1 to nKeys + 10).flatMap { k => // +10: keys beyond base (inserts)
        (1 to maxSeq).filter(_ => rnd.nextInt(100) < 40).map { s =>
          val del = rnd.nextInt(100) < 25
          (k.toLong, s.toLong, if (del) "D" else "U",
            if (del) Option.empty[Long] else Some(rnd.nextInt(1000).toLong))
        }
      }
      // sequential ground truth on the driver
      var state = baseRows.toMap
      for (s <- 1 to maxSeq; (k, _, op, v) <- logRows.filter(_._2 == s))
        state = if (op == "D") state - k else state.updated(k, v.get)

      val baseDf = baseRows.toDF("k", "v")
      val logDf = logRows.toDF("k", "seq", "op", "v")
      val out = Merge.applyChangeLog(baseDf, logDf, "k", "seq", "op")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) Option.empty[Long] else Some(r.getLong(1)))).toMap
      assert(out === state.map { case (k, v) => k -> Some(v) },
        s"trial $trial diverged (base=${baseRows.size}, log=${logRows.size})")
    }
  }

  test("applyChangeLog: delete of an absent key and re-insert after delete behave") {
    val b = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val log = Seq(
      (9L, 1L, "D", Option.empty[Long]),  // delete of a key not in base: no-op
      (1L, 1L, "D", Option.empty[Long]),  // delete 1...
      (1L, 2L, "U", Some(99L)),           // ...then re-insert at a later seq
      (2L, 1L, "U", Some(25L))).toDF("k", "seq", "op", "v")
    val out = Merge.applyChangeLog(b, log, "k", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 99L), (2L, 25L)))
  }
}
