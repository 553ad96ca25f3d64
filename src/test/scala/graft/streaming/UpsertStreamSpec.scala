package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

case class Change(id: Long, name: String, day: String, seq: Long)

class UpsertStreamSpec extends SparkSpec {
  import spark.implicits._

  test("upsertStream: inserts, last-write-wins updates, untouched partitions survive") {
    val tmp = Files.createTempDirectory("graft-upsert")
    val basePath = tmp.resolve("silver").toString
    val ckpt = tmp.resolve("ckpt").toString
    implicit val sc = spark.sqlContext

    val source = MemoryStream[Change]
    val q = StreamingOps.upsertStream(
      source.toDF(), basePath, key = "id", orderCol = "seq",
      partitionCol = "day", checkpoint = ckpt)
    try {
      // batch 1: seed two partitions; id=2 appears twice — seq 5 wins
      source.addData(
        Change(1L, "a0", "d1", 1L),
        Change(2L, "b0", "d2", 2L),
        Change(2L, "b1", "d2", 5L))
      q.processAllAvailable()
      val after1 = spark.read.parquet(basePath)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSet
      assert(after1 === Set((1L, "a0"), (2L, "b1")))

      // batch 2: update id=1 (partition d1) only — d2 must survive untouched
      source.addData(Change(1L, "a1", "d1", 9L))
      q.processAllAvailable()
      val after2 = spark.read.parquet(basePath)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"))).toSet
      assert(after2 === Set((1L, "a1"), (2L, "b1")))
    } finally q.stop()
  }
}
