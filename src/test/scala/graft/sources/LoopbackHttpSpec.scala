package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integration coverage for the LIVE transport path with zero egress:
  * an in-process `com.sun.net.httpserver` loopback server stands in
  * for the remote API, so `HttpTransport` (java.net.http), the
  * `safeGet` retry/backoff/Retry-After policy, and the DSv2
  * untrusted-param residual re-filter all run their production code —
  * the paths previously spec'd only through `FixtureTransport`.
  */
class LoopbackHttpSpec extends SparkSpec {

  private var server: HttpServer = _
  private def baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def respond(ex: HttpExchange, status: Int, body: String,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private val posts =
    """[
      |  {"id": 1, "userId": 1, "title": "a"},
      |  {"id": 2, "userId": 7, "title": "b"},
      |  {"id": 3, "userId": 7, "title": "c"}
      |]""".stripMargin

  private val flakyHits = new AtomicInteger(0)
  private val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    // echoes the raw query string so param encoding is observable
    server.createContext("/echo", (ex: HttpExchange) =>
      respond(ex, 200,
        s"""[{"q": "${Option(ex.getRequestURI.getRawQuery).getOrElse("")}"}]"""))

    // an endpoint that IGNORES query params: always the full array —
    // the exact shape the residual re-filter exists for
    server.createContext("/ignores-params", (ex: HttpExchange) =>
      respond(ex, 200, posts))

    // paged endpoint: ?page=N (no param -> page 1)
    server.createContext("/paged", (ex: HttpExchange) => {
      val page = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").collectFirst {
          case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
        }.getOrElse(1)
      val rows = (1 to 2).map(i => s"""{"id": ${(page - 1) * 2 + i}, "pg": $page}""")
      respond(ex, 200, rows.mkString("[", ",", "]"))
    })

    // two 503s with Retry-After, then success
    server.createContext("/flaky", (ex: HttpExchange) => {
      if (flakyHits.incrementAndGet() <= 2)
        respond(ex, 503, "", Map("Retry-After" -> "3"))
      else respond(ex, 200, """[{"ok": true}]""")
    })

    server.createContext("/gone", (ex: HttpExchange) => respond(ex, 404, ""))

    server.setExecutor(null) // current thread per exchange
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("HttpTransport sends URL-encoded query params and returns the body") {
    val body = new HttpTransport().get(s"$baseUrl/echo",
      Map("userId" -> "7", "x y" -> "a&b"), timeoutSec = 5)
    // both params on the wire, encoded; order is map order (2 entries)
    assert(body.contains("userId=7"), body)
    assert(body.contains("x+y=a%26b"), body)
  }

  test("safeGet honors Retry-After on 503 and succeeds on the third attempt") {
    flakyHits.set(0)
    sleeps.clear()
    val body = ApiSource.safeGet(new HttpTransport(), s"$baseUrl/flaky",
      Map.empty, timeoutSec = 5, retries = 3, sleep = sleeps.append(_))
    assert(body.contains("\"ok\""))
    assert(flakyHits.get() === 3)
    // Retry-After: 3 -> 3000ms base + 100ms*attempt linear jitter
    assert(sleeps.toSeq === Seq(3000L, 3100L), sleeps)
  }

  test("safeGet on persistent 404 exhausts retries and raises ApiError with the status cause") {
    sleeps.clear()
    val e = intercept[ApiError](
      ApiSource.safeGet(new HttpTransport(), s"$baseUrl/gone",
        Map.empty, timeoutSec = 5, retries = 2, sleep = sleeps.append(_)))
    assert(e.getMessage.contains("after 3 attempts"), e.getMessage)
    assert(e.getCause.isInstanceOf[HttpStatusError])
    assert(e.getCause.asInstanceOf[HttpStatusError].status === 404)
    // non-429/503 path: exponential 2^attempt capped at 8s + jitter
    assert(sleeps.toSeq === Seq(1000L, 2100L), sleeps)
  }

  test("DSv2 over live HTTP: endpoint ignoring the pushed param is corrected by the residual re-filter") {
    val df = spark.read.format("graft-api")
      .option("url", s"$baseUrl/ignores-params")
      .load()
      .filter(col("userId") === 7L)
    // untrusted param: pushed best-effort AND kept as a residual
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), plan)
    // the endpoint returned all 3 rows; the residual must cut to 2
    assert(df.collect().map(_.getAs[Long]("id")).sorted.toSeq === Seq(2L, 3L))
  }

  test("DSv2 paged live HTTP: executors fetch their own pages through HttpTransport") {
    val df = spark.read.format("graft-api")
      .option("url", s"$baseUrl/paged")
      .option("pages", "3")
      .load()
    assert(df.rdd.getNumPartitions === 3)
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      (1L to 6L).toSeq)
    assert(df.groupBy("pg").count().collect()
      .map(r => (r.getAs[Long]("pg"), r.getAs[Long]("count"))).sorted.toSeq ===
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }
}
