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
}
