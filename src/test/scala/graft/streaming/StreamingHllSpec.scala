package graft.streaming

import graft.SparkSpec
import graft.functions.PortableHll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import StreamingOps.{HllEstimate, HllRow}

/** Streaming approximate distinct count: the portable-HLL register
  * state must make the streaming estimate BIT-IDENTICAL to the batch
  * sketch over the distinct keys seen so far — duplicate insensitivity
  * and max-merge are what let the sketch stream.
  */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  /** Batch reference: estimate via the same expr pipeline + Scala fold. */
  private def batchEstimate(keys: Seq[Long]): Double = {
    val regs = new Array[Byte](PortableHll.M)
    StreamingOps.hllRows(keys.toDF("k").withColumn("g", lit("g")), "g", "k")
      .as[HllRow].collect()
      .foreach(r => if (r.rho > regs(r.bucket)) regs(r.bucket) = r.rho.toByte)
    PortableHll.estimateFromRegisters(regs)
  }

  test("streaming estimate equals the batch sketch after every micro-batch") {
    implicit val sc = spark.sqlContext
    val source = MemoryStream[HllRow]
    val q = StreamingOps.approxDistinctStream(source.toDS())
      .writeStream.format("memory").queryName("hll_out")
      .outputMode(OutputMode.Update()).start()

    def latest(): Map[String, Double] =
      spark.table("hll_out").as[HllEstimate].collect()
        .groupBy(_.group).map { case (g, es) => (g, es.last.estimate) }

    def rowsFor(keys: Seq[Long]): Seq[HllRow] =
      StreamingOps.hllRows(keys.toDF("k").withColumn("g", lit("g")), "g", "k")
        .as[HllRow].collect().toSeq

    try {
      val batch1 = (1L to 1500L)
      source.addData(rowsFor(batch1): _*)
      q.processAllAvailable()
      assert(latest()("g") === batchEstimate(batch1))

      // overlapping second batch: 1000..2500 — 1000 duplicates the
      // sketch must absorb; union cardinality 2500
      val batch2 = (1000L to 2500L)
      source.addData(rowsFor(batch2): _*)
      q.processAllAvailable()
      val est = latest()("g")
      assert(est === batchEstimate((batch1 ++ batch2).distinct))
      // and the estimate lands within the published 1.04/sqrt(256)
      // relative error x4 of the true 2500
      assert(math.abs(est - 2500.0) / 2500.0 < 4 * 1.04 / math.sqrt(PortableHll.M))
    } finally q.stop()
  }

  test("state is per-group: interleaved groups estimate independently") {
    implicit val sc = spark.sqlContext
    val source = MemoryStream[HllRow]
    val q = StreamingOps.approxDistinctStream(source.toDS())
      .writeStream.format("memory").queryName("hll_out2")
      .outputMode(OutputMode.Update()).start()
    try {
      val a = StreamingOps.hllRows(
        (1L to 800L).toDF("k").withColumn("g", lit("a")), "g", "k").as[HllRow].collect()
      val b = StreamingOps.hllRows(
        (1L to 3000L).toDF("k").withColumn("g", lit("b")), "g", "k").as[HllRow].collect()
      source.addData(a.toSeq ++ b.toSeq: _*)
      q.processAllAvailable()
      val ests = spark.table("hll_out2").as[HllEstimate].collect()
        .groupBy(_.group).map { case (g, es) => (g, es.last.estimate) }
      assert(math.abs(ests("a") - 800.0) / 800.0 < 4 * 1.04 / math.sqrt(PortableHll.M))
      assert(math.abs(ests("b") - 3000.0) / 3000.0 < 4 * 1.04 / math.sqrt(PortableHll.M))
      assert(ests("a") < ests("b"))
    } finally q.stop()
  }
}
