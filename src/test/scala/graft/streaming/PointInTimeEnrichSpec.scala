package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.collection.mutable.ArrayBuffer

case class FactEvent(k: Long, t: Long, amount: Long)

/** Point-in-time (as-of) enrichment per micro-batch through the
  * native AsOfJoinExec: facts must see the dimension version current
  * AT their event time — never a later one — and tolerance refuses
  * stale versions.
  */
class PointInTimeEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq(
    // (dk, version_t, state)
    (1L, 0L, "v0"), (1L, 100L, "v1"), (1L, 200L, "v2"),
    (2L, 150L, "w0")
  ).toDF("dk", "vt", "state")

  test("each micro-batch fact joins the version at-or-before its time") {
    implicit val sc = spark.sqlContext
    val source = MemoryStream[FactEvent]
    val got = ArrayBuffer.empty[(Long, Long, String)]
    val q = StreamingOps.pointInTimeEnrich(
      source.toDS().toDF(), dim, "k", "dk", "t", "vt") { (df, _) =>
      got.synchronized {
        got ++= df.collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"),
          Option(r.getAs[String]("state")).getOrElse("NONE")))
      }
    }
    try {
      source.addData(FactEvent(1L, 50L, 10L), FactEvent(1L, 100L, 11L),
        FactEvent(2L, 100L, 12L))
      q.processAllAvailable()
      // batch 1: k=1@50 → v0; k=1@100 → v1 (inclusive); k=2@100 → no version yet
      assert(got.toSet === Set((1L, 50L, "v0"), (1L, 100L, "v1"), (2L, 100L, "NONE")))
      got.clear()
      source.addData(FactEvent(1L, 250L, 13L), FactEvent(2L, 160L, 14L))
      q.processAllAvailable()
      // batch 2: k=1@250 → v2 (latest), k=2@160 → w0
      assert(got.toSet === Set((1L, 250L, "v2"), (2L, 160L, "w0")))
    } finally q.stop()
  }

  test("randomized multi-batch: every batch equals the brute-force as-of against the dim") {
    // Late-arriving facts across many micro-batches: whatever order
    // fact events arrive in, each batch's enrichment must equal the
    // brute-force point-in-time definition (greatest version at or
    // before the fact time, within tolerance) — i.e. batch boundaries
    // and batch composition are invisible to the semantics.
    val rnd = new scala.util.Random(83)
    val dimRows = (for {
      k <- 1L to 4L
      vt <- Seq.fill(rnd.nextInt(5))(rnd.nextInt(300).toLong).distinct
    } yield (k, vt, s"k${k}v$vt"))
    val dimDf = dimRows.toDF("dk", "vt", "state")
    val tol = Some(60L)
    def brute(k: Long, t: Long): String =
      dimRows.filter(d => d._1 == k && d._2 <= t && t - d._2 <= tol.get)
        .sortBy(_._2).lastOption.map(_._3).getOrElse("NONE")

    implicit val sc = spark.sqlContext
    val source = MemoryStream[FactEvent]
    val got = ArrayBuffer.empty[(Long, Long, String)]
    val q = StreamingOps.pointInTimeEnrich(
      source.toDS().toDF(), dimDf, "k", "dk", "t", "vt",
      toleranceMicros = tol) { (df, _) =>
      got.synchronized {
        got ++= df.collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"),
          Option(r.getAs[String]("state")).getOrElse("NONE")))
      }
    }
    try {
      var expected = Set.empty[(Long, Long, String)]
      for (batch <- 1 to 5) {
        val facts = Seq.fill(3 + rnd.nextInt(6))(FactEvent(
          1L + rnd.nextInt(4), rnd.nextInt(320).toLong, rnd.nextLong().abs))
        // times are random, NOT monotone: late facts in later batches
        // must still see their point-in-time version, never a newer one
        source.addData(facts: _*)
        q.processAllAvailable()
        expected ++= facts.map(f => (f.k, f.t, brute(f.k, f.t)))
        assert(got.toSet === expected,
          s"batch $batch diverged: missing=${expected -- got.toSet} extra=${got.toSet -- expected}")
      }
    } finally q.stop()
  }

  test("tolerance refuses versions older than the staleness bound") {
    implicit val sc = spark.sqlContext
    val source = MemoryStream[FactEvent]
    val got = ArrayBuffer.empty[(Long, String)]
    val q = StreamingOps.pointInTimeEnrich(
      source.toDS().toDF(), dim, "k", "dk", "t", "vt",
      toleranceMicros = Some(30L)) { (df, _) =>
      got.synchronized {
        got ++= df.collect().map(r => (r.getAs[Long]("t"),
          Option(r.getAs[String]("state")).getOrElse("NONE")))
      }
    }
    try {
      // k=1@120: v1 is 20 old (within 30) → match; k=1@180: v1 is 80 old → refused
      source.addData(FactEvent(1L, 120L, 1L), FactEvent(1L, 180L, 2L))
      q.processAllAvailable()
      assert(got.toSet === Set((120L, "v1"), (180L, "NONE")))
    } finally q.stop()
  }
}
