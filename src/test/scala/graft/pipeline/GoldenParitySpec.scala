package graft.pipeline

import graft.SparkSpec
import graft.config.PipelineConfig
import graft.meta.Manifest
import org.apache.spark.sql.types._

/** Behavior-parity test against the reference's own end-to-end input
  * (reference data-lake/temp/IBC_municipios_indicadores_normalizados.csv;
  * golden facts from the checked-in manifest
  * data-lake/bronze/tb_indicadores_municipio/anomesdia=20251020/
  * indmunicipios.txt.manifest.json: 22,280 rows, 16,723 nulls in
  * cobertura_area_agricultavel, 0 elsewhere). Cancels gracefully when
  * the reference checkout is absent.
  */
class GoldenParitySpec extends SparkSpec {

  private val refCsv =
    "/root/reference/data-lake/temp/IBC_municipios_indicadores_normalizados.csv"

  private def cfg: PipelineConfig = PipelineConfig.fromJson(
    s"""{
       | "dataset_id": "tb_indicadores_municipio",
       | "origin": "golden-parity",
       | "csv": {"path": "$refCsv", "sep": ";", "encoding": "UTF-8", "header": true},
       | "schema": {
       |   "rename_map": {
       |     "Ano": "ano", "Código Município": "codigo_municipio",
       |     "Município": "municipio", "UF": "uf", "IBC": "ibc",
       |     "Cobertura Pop. 4G5G": "cobertura_pop_4g5g",
       |     "Densidade SMP": "densidade_smp", "HHI SMP": "hhi_smp",
       |     "Densidade SCM": "densidade_scm", "HHI SCM": "hhi_scm",
       |     "Adensamento Estações": "adensamento_estacoes", "Fibra": "fibra",
       |     "Cobertura área agricultável": "cobertura_area_agricultavel"},
       |   "required_columns": ["ano", "codigo_municipio", "municipio", "uf", "ibc",
       |     "cobertura_pop_4g5g", "densidade_smp", "hhi_smp", "densidade_scm",
       |     "hhi_scm", "adensamento_estacoes", "fibra", "cobertura_area_agricultavel"],
       |   "integer_fields": ["ano"],
       |   "string_fields": ["codigo_municipio", "municipio", "uf"],
       |   "float_fields": ["ibc", "cobertura_pop_4g5g", "densidade_smp", "hhi_smp",
       |     "densidade_scm", "hhi_scm", "adensamento_estacoes", "fibra",
       |     "cobertura_area_agricultavel"]},
       | "sink": {"base_dir": "/tmp/graft-golden-bronze", "table": "tb_indicadores_municipio",
       |          "file_name": "indmunicipios.txt"},
       | "preview_columns": ["municipio", "uf", "densidade_smp"],
       | "preview_limit": 10
       |}""".stripMargin)

  test("reference CSV: 22,280 rows, golden dtypes, null counts and values") {
    assume(new java.io.File(refCsv).exists, "reference checkout not present")

    val (df, extras) = CsvIngestion.prepare(spark, cfg)
    assert(extras.isEmpty)

    // dtype parity: Int64 → long, strings, 9 float64 → double
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("ano") === LongType)
    assert(types("codigo_municipio") === StringType)
    assert(types("municipio") === StringType)
    assert(types("uf") === StringType)
    Seq("ibc", "cobertura_pop_4g5g", "densidade_smp", "hhi_smp", "densidade_scm",
      "hhi_scm", "adensamento_estacoes", "fibra", "cobertura_area_agricultavel")
      .foreach(c => assert(types(c) === DoubleType, c))

    // one-pass stats job = the manifest aggregate
    val (rows, nulls) = Manifest.tableStats(df)
    assert(rows === 22280L)
    assert(nulls("cobertura_area_agricultavel") === 16723L)
    assert(nulls.filterNot(_._1 == "cobertura_area_agricultavel").values.forall(_ == 0L))

    // value parity with the golden output's first rows
    // (.../indmunicipios.txt:2-3): decimal commas parsed, HHI "44" → 44.0
    val first = df.filter(df("codigo_municipio") === "1100015").head()
    assert(first.getAs[Long]("ano") === 2024L)
    assert(first.getAs[String]("municipio") === "Alta Floresta D'Oeste - RO") // quotes stripped
    assert(first.getAs[Double]("ibc") === 29.45)
    assert(first.getAs[Double]("hhi_smp") === 44.0)
    assert(first.getAs[Double]("fibra") === 0.0)
    val second = df.filter(df("codigo_municipio") === "1100023").head()
    assert(second.getAs[Double]("ibc") === 55.8) // "55,80" parses to 55.8
    assert(second.getAs[Double]("cobertura_area_agricultavel") === 12.1568)
  }
}
