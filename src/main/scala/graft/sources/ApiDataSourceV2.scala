package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the REST/JSON source — the
  * first-class form of the reference's source-side pushdown
  * (app/ingestao_api.py:88, where the `userId` predicate rides the
  * HTTP query string instead of filtering client-side).
  *
  * `spark.read.format("graft-api")` with options:
  *   - `url`        endpoint URL (identity of the dataset)
  *   - `fixture`    local JSON file backing `url` (offline transport;
  *                  omit for live HTTP)
  *   - `timeoutSec`, `retries`   the reference's retry policy knobs
  *
  * Planner integration:
  *   - **Filter pushdown** ([[SupportsPushDownFilters]]): top-level
  *     `EqualTo` predicates become request query params — evaluated by
  *     the source, NOT re-filtered by Spark (they are accepted, not
  *     returned as residuals). Everything else stays a residual.
  *   - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *     reader materializes only the pruned schema's fields.
  *
  * Execution shape: the payload is fetched ONCE on the driver at batch
  * planning (API payloads are driver-sized by definition — bulk data
  * enters through file sources) and shipped inside the single
  * [[InputPartition]]; executors parse rows without needing transport
  * or network access. Schema inference reads the first array element's
  * flat primitive fields (nested objects are out of the reference's
  * type system, SURVEY.md §1.2).
  */
final class ApiDataSourceV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-api"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val body = ApiDataSourceV2.fetch(options.asCaseSensitiveMap().asScala.toMap, Map.empty)
    ApiDataSourceV2.inferFromPayload(body)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ApiTable(schema, properties.asScala.toMap)
}

private[sources] object ApiDataSourceV2 {
  private val mapper = new ObjectMapper()

  /** Driver-side fetch through the configured transport with the
    * reference's retry/backoff policy (ApiSource.safeGet).
    */
  def fetch(opts: Map[String, String], params: Map[String, String]): String = {
    val url = opts.getOrElse("url", throw new ApiError("graft-api: missing 'url' option"))
    val transport: ApiTransport = opts.get("fixture") match {
      case Some(path) =>
        // paged fixtures: a `{page}` placeholder in the path selects the
        // page named by the request params (page 1 at schema inference,
        // where no params exist yet)
        val resolved = path.replace("{page}",
          params.getOrElse(pageParam(opts), "1"))
        new FixtureTransport(Map(url -> resolved))
      case None => new HttpTransport
    }
    ApiSource.safeGet(transport, url, params,
      timeoutSec = opts.getOrElse("timeoutSec", "20").toInt,
      retries = opts.getOrElse("retries", "2").toInt)
  }

  def pageParam(opts: Map[String, String]): String =
    opts.getOrElse("pageParam", "page")

  def inferFromPayload(body: String): StructType = {
    val root = mapper.readTree(body)
    val first =
      if (root.isArray && root.size() > 0) root.get(0)
      else if (root.isObject) root
      else throw new ApiError("graft-api: cannot infer schema from empty/scalar payload")
    val fields = first.properties().asScala.toSeq.flatMap { e =>
      val (name, v) = (e.getKey, e.getValue)
      val dt: Option[DataType] =
        if (v.isIntegralNumber) Some(LongType)
        else if (v.isFloatingPointNumber) Some(DoubleType)
        else if (v.isBoolean) Some(BooleanType)
        else if (v.isTextual || v.isNull) Some(StringType)
        else None // nested object/array: outside the reference's type system
      dt.map(StructField(name, _, nullable = true))
    }
    StructType(fields)
  }

  /** Parse the payload rows into InternalRows of `schema` (pruned). */
  def parse(body: String, schema: StructType): Iterator[InternalRow] = {
    val root = mapper.readTree(body)
    val nodes: Iterator[JsonNode] =
      if (root.isArray) root.elements().asScala
      else Iterator.single(root)
    nodes.map { node =>
      val values = schema.fields.map { f =>
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          case LongType    => java.lang.Long.valueOf(v.asLong())
          case DoubleType  => java.lang.Double.valueOf(v.asDouble())
          case BooleanType => java.lang.Boolean.valueOf(v.asBoolean())
          case _           => UTF8String.fromString(v.asText())
        }
      }
      new GenericInternalRow(values.asInstanceOf[Array[Any]])
    }
  }
}

private final class ApiTable(schema: StructType, properties: Map[String, String])
  extends Table with SupportsRead {

  override def name(): String = properties.getOrElse("url", "graft-api")
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ApiScanBuilder(schema, options.asCaseSensitiveMap().asScala.toMap)
}

private final class ApiScanBuilder(fullSchema: StructType, opts: Map[String, String])
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var prunedSchema: StructType = fullSchema

  /** Top-level equality predicates become request params (the
    * `?userId=7` pattern). Whether they also stay as residuals
    * depends on trust: a REST endpoint that silently IGNORES unknown
    * params would return unfiltered rows, and with no residual Spark
    * would never re-filter — silently wrong results. So only
    * attributes listed in the `pushdown.trusted` option (params the
    * endpoint is KNOWN to honor) are fully absorbed; everything else
    * is pushed best-effort AND returned as a residual for Spark's
    * cheap re-filter. Catalyst's derived `IsNotNull(attr)` is
    * absorbed when a trusted equality param on the same attribute
    * subsumes it (a source matching `attr=v` never returns null).
    */
  private val trustedAttrs: Set[String] = opts
    .collectFirst { case (k, v) if k.equalsIgnoreCase("pushdown.trusted") => v }
    .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    .getOrElse(Set.empty)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val trustedEq = filters.collect {
      case EqualTo(attr, _) if trustedAttrs.contains(attr) => attr
    }.toSet
    pushed = filters.filter {
      case EqualTo(attr, _) => fullSchema.fieldNames.contains(attr)
      case org.apache.spark.sql.sources.IsNotNull(attr) => trustedEq.contains(attr)
      case _ => false
    }
    // residual = anything not provably evaluated by the source
    filters.filter {
      case EqualTo(attr, _) => !trustedEq.contains(attr)
      case org.apache.spark.sql.sources.IsNotNull(attr) => !trustedEq.contains(attr)
      case _ => true
    }
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve source field order; requiredSchema order follows usage
    val keep = requiredSchema.fieldNames.toSet
    prunedSchema = StructType(fullSchema.fields.filter(f => keep.contains(f.name)))
  }

  override def build(): Scan = {
    val params = pushed.collect { case EqualTo(a, v) => a -> String.valueOf(v) }.toMap
    new ApiScan(prunedSchema, opts, params,
      pushed.map(_.toString).sorted.mkString("[", ", ", "]"))
  }
}

private final class ApiScan(schema: StructType, opts: Map[String, String],
    params: Map[String, String], pushedDesc: String) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def description(): String =
    s"graft-api url=${opts.getOrElse("url", "?")} PushedFilters: $pushedDesc"
  override def toBatch: Batch = this

  /** Partition planning:
    *   - default: ONE partition; the fetch runs once on the driver and
    *     the body travels with the partition, so executors stay
    *     network-free (API payloads are driver-sized by contract);
    *   - `pages=N` (N >= 1): N partitions, one per page of a paginated
    *     endpoint; each EXECUTOR fetches its own page (query param
    *     `pageParam`, default `page`, values 1..N) — the shape that
    *     parallelizes REST ingestion across a cluster instead of
    *     serializing it through the driver. `pages=1` still sends the
    *     page param (page 1 of a paginated API is a different request
    *     than no param at all); a malformed value is an ApiError at
    *     planning time, not a bare NumberFormatException.
    */
  override def planInputPartitions(): Array[InputPartition] =
    opts.get("pages") match {
      case Some(raw) =>
        val n = raw.trim.toIntOption.getOrElse(throw new ApiError(
          s"invalid pages option '$raw': expected a positive integer"))
        if (n < 1) throw new ApiError(
          s"invalid pages option '$raw': expected a positive integer")
        val pp = ApiDataSourceV2.pageParam(opts)
        (1 to n).map(i =>
          PagedApiInputPartition(opts, params + (pp -> i.toString))
            : InputPartition).toArray
      case None =>
        Array(ApiInputPartition(ApiDataSourceV2.fetch(opts, params)))
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new ApiReaderFactory(schema)
}

private final case class ApiInputPartition(body: String) extends InputPartition

/** Executor-side-fetch partition: carries the request, not the data. */
private final case class PagedApiInputPartition(
    opts: Map[String, String], params: Map[String, String]) extends InputPartition

private final class ApiReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val body = partition match {
      case ApiInputPartition(b)            => b
      case PagedApiInputPartition(opts, p) => ApiDataSourceV2.fetch(opts, p)
    }
    val it = ApiDataSourceV2.parse(body, schema)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
