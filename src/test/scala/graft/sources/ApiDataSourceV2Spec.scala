package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataSource V2 connector: schema inference, source-side filter
  * pushdown (no residual re-filter in the plan), and column pruning
  * down to the reader.
  */
class ApiDataSourceV2Spec extends SparkSpec {

  private val payload =
    """[
      |  {"id": 1, "userId": 1, "title": "a post", "score": 1.5, "flag": true},
      |  {"id": 2, "userId": 7, "title": "b post", "score": 2.5, "flag": false},
      |  {"id": 3, "userId": 7, "title": "c post", "score": 3.5, "flag": true}
      |]""".stripMargin

  private def fixtureDf(extra: (String, String)*) = {
    val f = Files.createTempFile("graft-api-v2", ".json")
    Files.write(f, payload.getBytes("UTF-8"))
    extra.foldLeft(
      spark.read.format("graft-api")
        .option("url", "https://api.test/posts")
        .option("fixture", f.toString)) { case (r, (k, v)) => r.option(k, v) }
      .load()
  }

  test("schema inference maps flat JSON primitives to Spark types") {
    val df = fixtureDf()
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types === Map(
      "id" -> "bigint", "userId" -> "bigint", "title" -> "string",
      "score" -> "double", "flag" -> "boolean"))
    assert(df.count() === 3)
  }

  test("trusted EqualTo pushes into the request params; no Spark-side re-filter") {
    val df = fixtureDf("pushdown.trusted" -> "userId").filter(col("userId") === 7L)
    // pushdown visible in the scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("userId"), plan)
    // the predicate is accepted (not residual): no Filter node remains
    assert(!plan.contains("+- *(1) Filter"), plan)
    // and the SOURCE applied it: only user 7's rows come back
    assert(df.collect().map(_.getAs[Long]("id")).sorted.toSeq === Seq(2L, 3L))
  }

  test("untrusted EqualTo is pushed best-effort but KEPT as a residual re-filter") {
    val df = fixtureDf().filter(col("userId") === 7L)
    val plan = df.queryExecution.executedPlan.toString
    // still forwarded as a request param...
    assert(plan.contains("PushedFilters") && plan.contains("userId"), plan)
    // ...but Spark re-filters, guarding against an endpoint that
    // ignores unknown params and returns unfiltered rows
    assert(plan.contains("Filter"), plan)
    assert(df.collect().map(_.getAs[Long]("id")).sorted.toSeq === Seq(2L, 3L))
  }

  test("non-equality predicates stay residual and still evaluate correctly") {
    val df = fixtureDf().filter(col("score") > 2.0 && col("userId") === 7L)
    assert(df.collect().map(_.getAs[Long]("id")).sorted.toSeq === Seq(2L, 3L))
  }

  test("column pruning reaches the reader schema") {
    val df = fixtureDf().filter(col("userId") === 7L).select("title")
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("title") && !scanLine.contains("score"), scanLine)
    assert(df.collect().map(_.getString(0)).sorted.toSeq === Seq("b post", "c post"))
  }

  test("user-supplied schema overrides inference") {
    val f = Files.createTempFile("graft-api-v2b", ".json")
    Files.write(f, payload.getBytes("UTF-8"))
    val df = spark.read.format("graft-api")
      .schema("id LONG, title STRING")
      .option("url", "https://api.test/posts")
      .option("fixture", f.toString)
      .load()
    assert(df.columns.toSeq === Seq("id", "title"))
    assert(df.count() === 3)
  }

  test("pages=N plans N partitions, each fetching its own page") {
    val dir = Files.createTempDirectory("graft-api-pages")
    (1 to 3).foreach { p =>
      val rows = (1 to 4).map(i =>
        s"""{"id": ${(p - 1) * 4 + i}, "page": $p}""").mkString("[", ",", "]")
      Files.write(dir.resolve(s"page$p.json"), rows.getBytes("UTF-8"))
    }
    val df = spark.read.format("graft-api")
      .option("url", "https://api.test/paged")
      .option("fixture", s"$dir/page{page}.json")
      .option("pages", "3")
      .load()
    // one input partition per page — the unit of executor parallelism
    assert(df.rdd.getNumPartitions === 3)
    // and the union of the pages is the dataset
    assert(df.count() === 12)
    assert(df.selectExpr("max(id)").collect().head.getLong(0) === 12L)
    assert(df.groupBy("page").count().collect().map(r =>
      (r.getAs[Long]("page"), r.getAs[Long]("count"))).sorted.toSeq ===
      Seq((1L, 4L), (2L, 4L), (3L, 4L)))
  }

  test("pages=1 is an executor-side fetch OF page 1, not the no-param driver path") {
    val dir = Files.createTempDirectory("graft-api-page1")
    Files.write(dir.resolve("page1.json"),
      """[{"id": 10, "page": 1}, {"id": 11, "page": 1}]""".getBytes("UTF-8"))
    val df = spark.read.format("graft-api")
      .option("url", "https://api.test/paged")
      // resolves {page} — succeeds ONLY if the page param was sent
      .option("fixture", s"$dir/page{page}.json")
      .option("pages", "1")
      .load()
    assert(df.rdd.getNumPartitions === 1)
    assert(df.collect().map(_.getAs[Long]("id")).sorted.toSeq === Seq(10L, 11L))
  }

  test("pages=0 and malformed pages fail with ApiError at planning, not NumberFormatException") {
    for (bad <- Seq("0", "-2", "three", "1.5")) {
      val df = fixtureDf("pages" -> bad)
      val e = intercept[Exception](df.count())
      // the planner throws our typed error; Spark may wrap it
      val root = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).toSeq.last
      assert(root.isInstanceOf[ApiError] ||
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .exists(_.isInstanceOf[ApiError]),
        s"pages=$bad: expected ApiError, got $e")
      assert(!e.isInstanceOf[NumberFormatException])
    }
  }
}
