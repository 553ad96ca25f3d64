package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Semantic proofs for q116 (strict ordered funnel) and q117 (weekly
  * retention cohorts) on hand-built event streams — orderings the
  * synthetic testdata may not exercise: clicks before views, purchases
  * between view and click, returns with week gaps.
  *
  * Events are written as LONG epoch-nanos `ts` (the same physical
  * shape `QueryDef.table` normalizes for the real events table).
  */
class FunnelCohortSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** day `d` of 2024 (UTC) as epoch nanos */
  private def dayNs(d: Int): Long =
    (java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond) * 1000000000L

  private def writeEvents(rows: Seq[(Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-funnel").toString
    val data = rows.zipWithIndex.map { case ((uid, ts, et), i) =>
      Row(i.toLong, ts, uid, et, 1.0, "{}")
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q116: funnel stages require strict event-time order per user") {
    val dir = writeEvents(Seq(
      // user 1: view < click < purchase — full funnel
      (1L, dayNs(0), "view"), (1L, dayNs(1), "click"), (1L, dayNs(2), "purchase"),
      // user 2: click BEFORE first view — click stage fails
      (2L, dayNs(0), "click"), (2L, dayNs(1), "view"), (2L, dayNs(2), "purchase"),
      // user 3: no click at all
      (3L, dayNs(0), "view"), (3L, dayNs(1), "purchase"),
      // user 4: purchase sits between view and click — purchase stage fails
      (4L, dayNs(0), "view"), (4L, dayNs(1), "purchase"), (4L, dayNs(2), "click"),
      // user 5: never viewed — excluded from every stage
      (5L, dayNs(0), "click"), (5L, dayNs(1), "purchase")))
    val r = SparkEntry.queries("q116_event_funnel")(spark, dir).collect().head
    assert(r.getAs[Long]("n_view") === 4L)
    assert(r.getAs[Long]("n_click_after_view") === 2L) // users 1 and 4
    assert(r.getAs[Long]("n_purchase_after_click") === 1L) // user 1 only
  }

  test("q117: cohort week from first activity; offsets count week gaps") {
    // 2024-01-01 is a Monday: days 0..6 = week 0, 7..13 = week 1, ...
    val dir = writeEvents(Seq(
      (1L, dayNs(0), "view"), (1L, dayNs(15), "view"),  // cohort w0, back in w2
      (2L, dayNs(1), "view"), (2L, dayNs(8), "view"),   // cohort w0, back in w1
      (3L, dayNs(9), "view")))                          // cohort w1 only
    val rows = SparkEntry.queries("q117_retention_cohorts")(spark, dir)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Long]("offset"), r.getAs[Long]("n_users")))
      .toSet
    assert(rows === Set(
      ("2024-01-01", 0L, 2L), // users 1,2 in their cohort week
      ("2024-01-01", 1L, 1L), // user 2 returns next week
      ("2024-01-01", 2L, 1L), // user 1 returns two weeks later
      ("2024-01-08", 0L, 1L))) // user 3's cohort
  }
}
