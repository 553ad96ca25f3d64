package graft.cast

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style randomized coverage for the cast layer: one seeded
  * sample batch, evaluated in a single Spark job per property.
  */
class CastPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("toDoublePt round-trips pt-BR formatted doubles (2 decimals)") {
    val samples = Seq.fill(200) {
      val v = math.round(rnd.between(-1e6, 1e6) * 100.0) / 100.0
      val pt = f"$v%,.2f".replace(",", "#").replace(".", ",").replace("#", ".")
      (pt, v)
    }
    val out = samples.toDF("pt", "expected")
      .select(Casts.toDoublePt(col("pt")).as("parsed"), col("expected"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1), r))
  }

  test("toLongLenient parses any long's toString, with or without .0") {
    val longs = Seq.fill(200)(rnd.nextLong() % 1000000000L)
    val out = longs.toDF("v")
      .select(col("v"),
        Casts.toLongLenient(col("v").cast("string")).as("plain"),
        Casts.toLongLenient(concat(col("v").cast("string"), lit(".0"))).as("dotted"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(0))
      assert(r.getLong(2) === r.getLong(0))
    }
  }

  test("toCleanString is idempotent") {
    val strings = Seq.fill(200) {
      val core = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      val quoted = if (rnd.nextBoolean()) "\"" + core + "\"" else core
      "  " * rnd.nextInt(2) + quoted + " " * rnd.nextInt(2)
    }
    val out = strings.toDF("s")
      .select(
        Casts.toCleanString(col("s")).as("once"),
        Casts.toCleanString(Casts.toCleanString(col("s"))).as("twice"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("applyCasts never changes column count or order") {
    val df = Seq(("1", "a", "2,5", "x")).toDF("c1", "c2", "c3", "c4")
    val out = Casts.applyCasts(df,
      integerFields = Seq("c1", "ghost1"),
      stringFields = Seq("c2"),
      floatFields = Seq("c3", "ghost2"))
    assert(out.columns.toSeq === df.columns.toSeq)
  }
}
