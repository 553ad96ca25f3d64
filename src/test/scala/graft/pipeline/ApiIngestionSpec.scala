package graft.pipeline

import graft.SparkSpec
import graft.config.PipelineConfig
import graft.sources.{ApiSource, ApiTransport, FixtureTransport, HttpStatusError}
import java.nio.file.Files

class ApiIngestionSpec extends SparkSpec {

  private val clock = java.time.Clock.fixed(
    java.time.Instant.parse("2025-10-20T12:00:00Z"), java.time.ZoneOffset.UTC)

  private def writeFixtures(dir: java.nio.file.Path): (String, String) = {
    val users =
      """[
        |{"id": 7, "name": "Kurtis Weissnat", "username": "Elwyn.Skiles", "email": "k@x.io", "phone": "ignored"},
        |{"id": 1, "name": "Leanne Graham", "username": "Bret", "email": "l@x.io", "phone": "ignored"}
        |]""".stripMargin
    val posts =
      """[
        |{"userId": 7, "id": 61, "title": "voluptatem", "body": "line one\nline two"},
        |{"userId": 7, "id": 62, "title": "beatae", "body": "b; with delimiter"},
        |{"userId": 1, "id": 1, "title": "other user", "body": "x"}
        |]""".stripMargin
    val uf = dir.resolve("users.json"); Files.write(uf, users.getBytes("UTF-8"))
    val pf = dir.resolve("posts.json"); Files.write(pf, posts.getBytes("UTF-8"))
    (uf.toString, pf.toString)
  }

  private def cfgs(baseDir: String): (PipelineConfig, PipelineConfig) = {
    val users = PipelineConfig.fromJson(
      s"""{
         | "dataset_id": "tb_test_users", "origin": "api-fixture",
         | "api": {"base_url": "https://api.test", "endpoints": {"users": "/users", "posts": "/posts"},
         |         "timeout": 20, "retries": 2},
         | "schema": {
         |   "rename_map": {"id": "user_id", "name": "nome", "username": "usuario", "email": "email"},
         |   "required_columns": ["user_id", "nome", "usuario", "email"],
         |   "integer_fields": ["user_id"],
         |   "string_fields": ["nome", "usuario", "email"]},
         | "sink": {"base_dir": "$baseDir", "table": "tb_test_users", "file_name": "users.txt"}
         |}""".stripMargin)
    val posts = PipelineConfig.fromJson(
      s"""{
         | "dataset_id": "tb_test_posts", "origin": "api-fixture",
         | "api": {"base_url": "https://api.test", "endpoints": {"users": "/users", "posts": "/posts"},
         |         "timeout": 20, "retries": 2},
         | "schema": {
         |   "rename_map": {"userId": "user_id", "id": "post_id", "title": "titulo", "body": "conteudo"},
         |   "required_columns": ["user_id", "post_id", "titulo", "conteudo"],
         |   "integer_fields": ["user_id", "post_id"],
         |   "string_fields": ["titulo", "conteudo"]},
         | "sink": {"base_dir": "$baseDir", "table": "tb_test_posts", "file_name": "posts.txt"}
         |}""".stripMargin)
    (users, posts)
  }

  test("end-to-end: lookup by name drives source-side pushdown; manifests written") {
    val tmp = Files.createTempDirectory("graft-api-test")
    val (uf, pf) = writeFixtures(tmp)
    val transport = new FixtureTransport(Map(
      "https://api.test/users" -> uf,
      "https://api.test/posts" -> pf))
    val (usersCfg, postsCfg) = cfgs(tmp.resolve("bronze").toString)

    val res = ApiIngestion.run(spark, usersCfg, postsCfg, transport,
      targetName = "Kurtis Weissnat", runId = "run-api", clock = clock)

    assert(res.targetUserId === 7L)
    assert(res.users.rows === 2)
    assert(res.posts.rows === 2) // pushdown filtered user 1's post at the source
    assert(res.posts.dataFile.contains("tb_test_posts/anomesdia=20251020/posts.txt"))

    val postsManifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(res.posts.dataFile + ".manifest.json")), "UTF-8")
    assert(postsManifest.contains("\"user_id\": \"7\"")) // extra section
    // reference-format sidecar: PT key names + endpoint + pandas dtypes
    // (reference app/utils/metadata.py:52-81)
    assert(postsManifest.contains("\"endpoint\": \"https://api.test/posts\""))
    assert(postsManifest.contains("\"linhas\": 2"))
    assert(postsManifest.contains("\"origem\""))
    assert(postsManifest.contains("\"delimitador\""))
    assert(postsManifest.contains("\"Int64\"")) // user_id dtype, pandas name
  }

  test("missing target user raises TargetUserNotFound") {
    val tmp = Files.createTempDirectory("graft-api-miss")
    val (uf, pf) = writeFixtures(tmp)
    val transport = new FixtureTransport(Map(
      "https://api.test/users" -> uf, "https://api.test/posts" -> pf))
    val (usersCfg, postsCfg) = cfgs(tmp.resolve("bronze").toString)
    intercept[TargetUserNotFound] {
      ApiIngestion.run(spark, usersCfg, postsCfg, transport, targetName = "Nobody")
    }
  }

  test("safeGet honors Retry-After on 429 then succeeds; backoff is capped") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val flaky = new ApiTransport {
      def get(url: String, params: Map[String, String], timeoutSec: Int): String = {
        calls += 1
        if (calls <= 2) throw new HttpStatusError(429, Some("3"))
        """[{"ok": true}]"""
      }
    }
    val body = ApiSource.safeGet(flaky, "u", Map.empty, 1, retries = 2, sleep = sleeps.append(_))
    assert(body.contains("ok"))
    assert(calls === 3)
    assert(sleeps.toSeq === Seq(3000L, 3100L)) // Retry-After 3s + linear jitter
  }

  test("safeGet exhausts retries then raises ApiError") {
    val dead = new ApiTransport {
      def get(url: String, params: Map[String, String], timeoutSec: Int): String =
        throw new HttpStatusError(500, None)
    }
    val e = intercept[graft.sources.ApiError] {
      ApiSource.safeGet(dead, "u", Map.empty, 1, retries = 1, sleep = _ => ())
    }
    assert(e.getMessage.contains("after 2 attempts"))
  }
}
