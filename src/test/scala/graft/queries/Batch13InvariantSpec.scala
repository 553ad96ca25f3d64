package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Cross-cutting invariants for the batch-13 curation operators. */
class Batch13InvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q204: split proportions are exact per stratum and cover every doc") {
    val df = SparkEntry.queries("q204_train_split")(spark, sf)
    val byLang = df.groupBy("lang").pivot("split").count().na.fill(0L).collect()
    assert(byLang.nonEmpty)
    byLang.foreach { r =>
      val train = r.getAs[Long]("train"); val va = r.getAs[Long]("val")
      val test = r.getAs[Long]("test"); val n = train + va + test
      assert(train === n * 8000 / 10000, s"${r.getString(0)}: train cut not exact")
      assert(train + va === n * 9000 / 10000, s"${r.getString(0)}: val cut not exact")
    }
    val total = QueryDef.table(spark, sf, "documents").count()
    assert(df.count() === total, "every document must receive a split")
    assert(df.select("doc_id").distinct().count() === total, "one split per doc")
  }

  test("q205: LTV curve is cumulative and conserves purchase revenue") {
    val df = SparkEntry.queries("q205_cohort_ltv")(spark, sf)
    val nonMono = df
      .withColumn("prev", lag("cum_revenue_c", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cohort_week").orderBy("age_w")))
      .filter(col("prev").isNotNull && col("cum_revenue_c") < col("prev"))
      .count()
    assert(nonMono === 0L, "cumulative revenue must be nondecreasing in age")
    val sumAges = df.agg(sum("revenue_c")).head().getLong(0)
    val total = QueryDef.table(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(floor(value * 100.0) AS BIGINT)"))).head().getLong(0)
    assert(sumAges === total, "per-age revenue must sum to all purchase cents")
  }

  test("q206: SNM candidates are distinct ordered pairs") {
    val df = SparkEntry.queries("q206_snm_neardup")(spark, sf)
    assert(df.filter(col("doc_id1") === col("doc_id2")).count() === 0L)
    assert(df.filter(col("dist") < 0 || col("dist") > 6).count() === 0L)
  }

  test("q208: every SAX word decodes to 3-bit symbols in 0..4") {
    val df = SparkEntry.queries("q208_sax_motifs")(spark, sf)
    val bad = df.filter((0 until 8).map(b =>
      expr(s"(sax_word div ${1L << (3 * b)}) % 8 > 4")).reduce(_ || _)).count()
    assert(bad === 0L, "a 3-bit field above 4 means the quartile formula broke")
  }

  test("q209: purchase-entry sessions always convert; rates are consistent") {
    val rows = SparkEntry.queries("q209_session_conversion")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_sessions"); val c = r.getAs[Long]("n_converted")
      assert(c <= n)
      assert(r.getAs[Long]("conv_bp") === c * 10000 / n)
      if (r.getAs[String]("entry_type") == "purchase")
        assert(c === n, "a session entered by a purchase contains one by definition")
    }
  }
}
