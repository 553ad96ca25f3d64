package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Config-driven pipeline parameters (reference app/config JSON files,
  * loaded at app/ingestao_csv.py:13-15 / app/ingestao_api.py:21-23).
  * Parsed with Jackson (bundled with Spark — no new dependency).
  */
final case class CsvReadConfig(
    path: String,
    sep: String = ";",
    encoding: String = "UTF-8",
    header: Boolean = true)

final case class ApiConfig(
    baseUrl: String,
    endpoints: Map[String, String],
    timeoutSec: Int = 20,
    retries: Int = 2)

/** Declared dataset schema: rename map for header normalization plus
  * per-type field lists (reference app/config/indicadores_municipios.json:8-52).
  */
final case class SchemaConfig(
    renameMap: Map[String, String] = Map.empty,
    requiredColumns: Seq[String] = Nil,
    integerFields: Seq[String] = Nil,
    stringFields: Seq[String] = Nil,
    floatFields: Seq[String] = Nil) {
  def declared: Seq[String] = (requiredColumns ++ integerFields ++ stringFields ++ floatFields).distinct
}

final case class SinkConfig(
    baseDir: String,
    table: String,
    fileName: String,
    partitionKey: String = "anomesdia",
    format: String = "csv")

final case class PipelineConfig(
    datasetId: String,
    origin: String,
    csv: Option[CsvReadConfig],
    api: Option[ApiConfig],
    schema: SchemaConfig,
    sink: SinkConfig,
    previewColumns: Seq[String] = Nil,
    previewLimit: Int = 10)

object PipelineConfig {
  private val mapper = new ObjectMapper()

  def fromJsonFile(path: String): PipelineConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def fromJson(json: String): PipelineConfig = {
    val n = mapper.readTree(json)
    def strSeq(node: JsonNode): Seq[String] =
      if (node == null) Nil else node.elements().asScala.map(_.asText()).toSeq
    def strMap(node: JsonNode): Map[String, String] =
      if (node == null) Map.empty
      else node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    def opt(node: JsonNode): Option[JsonNode] = Option(node)
    def str(node: JsonNode, field: String, default: String = null): String = {
      val v = node.get(field)
      if (v == null) {
        require(default != null, s"config missing required field '$field'")
        default
      } else v.asText()
    }

    val csv = opt(n.get("csv")).map { c =>
      CsvReadConfig(
        path = str(c, "path"),
        sep = str(c, "sep", ";"),
        encoding = str(c, "encoding", "UTF-8"),
        header = if (c.get("header") == null) true else c.get("header").asBoolean())
    }
    val api = opt(n.get("api")).map { a =>
      ApiConfig(
        baseUrl = str(a, "base_url"),
        endpoints = strMap(a.get("endpoints")),
        timeoutSec = if (a.get("timeout") == null) 20 else a.get("timeout").asInt(),
        retries = if (a.get("retries") == null) 2 else a.get("retries").asInt())
    }
    val s = n.get("schema")
    val schema =
      if (s == null) SchemaConfig()
      else SchemaConfig(
        renameMap = strMap(s.get("rename_map")),
        requiredColumns = strSeq(s.get("required_columns")),
        integerFields = strSeq(s.get("integer_fields")),
        stringFields = strSeq(s.get("string_fields")),
        floatFields = strSeq(s.get("float_fields")))
    val k = n.get("sink")
    require(k != null, "config missing 'sink' section")
    val sink = SinkConfig(
      baseDir = str(k, "base_dir"),
      table = str(k, "table"),
      fileName = str(k, "file_name"),
      partitionKey = str(k, "partition_key", "anomesdia"),
      format = str(k, "format", "csv"))
    PipelineConfig(
      datasetId = str(n, "dataset_id"),
      origin = str(n, "origin", ""),
      csv = csv,
      api = api,
      schema = schema,
      sink = sink,
      previewColumns = strSeq(n.get("preview_columns")),
      previewLimit = if (n.get("preview_limit") == null) 10 else n.get("preview_limit").asInt())
  }
}
