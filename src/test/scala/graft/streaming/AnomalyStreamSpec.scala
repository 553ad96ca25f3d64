package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import StreamingOps.{Anomaly, TypedValue}

/** Streaming z-score anomaly detection: rows score against the
  * moments as of the PRIOR batch, warmup suppresses early noise, and
  * the emitted z is exactly the batch-independent closed form over
  * the integer state.
  */
class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  test("anomalies flag against prior-batch moments after warmup") {
    implicit val sc = spark.sqlContext
    val source = MemoryStream[TypedValue]
    val q = StreamingOps.anomalyStream(source.toDS(), zThreshold = 3.0)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode(OutputMode.Update()).start()

    def emitted(): Seq[Anomaly] =
      spark.table("anom_out").as[Anomaly].collect().toSeq

    try {
      // batch 1: 100 calm rows (cents 900..1099, uniform-ish spread)
      // — below nothing is flagged: no prior state existed
      val calm = (0 until 100).map(i => TypedValue("a", i.toLong, 900L + 2 * i))
      source.addData(calm: _*)
      q.processAllAvailable()
      assert(emitted().isEmpty, "warmup/first batch must not flag")

      // batch 2: one extreme row among normals; score uses batch-1
      // moments exactly
      val n0 = 100L
      val s0 = calm.map(_.cents).sum
      val ss0 = calm.map(r => r.cents * r.cents).sum
      val mean = s0.toDouble / n0.toDouble
      val std = math.sqrt(
        (ss0.toDouble - s0.toDouble * s0.toDouble / n0.toDouble) / (n0 - 1).toDouble)
      source.addData(
        TypedValue("a", 200L, 1000L),
        TypedValue("a", 201L, 100000L),
        TypedValue("a", 202L, 1010L))
      q.processAllAvailable()
      val out = emitted()
      assert(out.map(_.event_id) === Seq(201L))
      val expectedZ = (100000.0 - mean) / std
      assert(out.head.z === expectedZ)
      assert(out.head.n_seen === 100L)

      // batch 3: the extreme row is now IN the moments — a repeat of
      // the same value still flags (it remains far out), but a calm
      // row does not, and groups are independent: a fresh group "b"
      // with no history flags nothing
      source.addData(
        TypedValue("a", 300L, 100000L),
        TypedValue("a", 301L, 1000L),
        TypedValue("b", 999L, 100000L))
      q.processAllAvailable()
      val third = emitted().filterNot(a => out.map(_.event_id).contains(a.event_id))
      assert(third.map(_.event_id) === Seq(300L))
      assert(third.head.n_seen === 103L)
    } finally q.stop()
  }
}
