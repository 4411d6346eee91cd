package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.JsonFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Partitioned HTTP DataSource V2 — the at-scale form of the reference's
  * snapshot GET (task.ts:112-117; SURVEY.md §2.1 R1): when the upstream
  * API supports offset reads, N executors page through it in parallel
  * instead of one driver-side fetch.
  *
  * ```
  * spark.read.format("graft-http")
  *   .option("url", "https://api/rows")          // required
  *   .option("schema", "id LONG, name STRING")   // required (DDL)
  *   .option("pageSize", "1000")                 // rows per request
  *   .option("numPartitions", "8")               // parallel readers
  *   .option("offsetParam", "offset")            // query-param names
  *   .option("limitParam", "limit")
  *   .option("header.X-API-KEY", "…")            // forwarded headers
  *   .load()
  * ```
  *
  * Partitioning is STRIDED paging: partition i fetches pages
  * i, i+N, i+2N, … so no total row count is needed up front. Each page is
  * `GET url?offset=<page·pageSize>&limit=<pageSize>`; a response with
  * fewer than `pageSize` rows marks the end of the relation (the standard
  * offset-pagination contract), so every reader past it terminates.
  * Pages decode executor-side through Spark's JacksonParser — the same
  * engine `from_json` uses, so type handling matches the batch path.
  *
  * Retries/idempotence: a task retry re-fetches only its own pages;
  * correctness needs the usual offset-API assumption that the relation is
  * stable for the duration of the read (same as any snapshot isolation
  * expectation on a REST export).
  */
class HttpTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = options.get("schema")
    require(ddl != null,
      "graft-http requires a 'schema' option (DDL, e.g. \"id LONG, name STRING\")")
    StructType.fromDDL(ddl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HttpTable(schema, properties.asScala.toMap)
}

private[sources] class HttpTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-http:${props.getOrElse("url", "?")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      private val url = options.get("url")
      require(url != null, "graft-http requires a 'url' option")
      private val pageSize = options.getInt("pageSize", 1000)
      private val numPartitions = options.getInt("numPartitions", 4)
      private val offsetParam =
        Option(options.get("offsetParam")).getOrElse("offset")
      private val limitParam =
        Option(options.get("limitParam")).getOrElse("limit")
      private val headers = options.asScala.collect {
        case (k, v) if k.startsWith("header.") => k.stripPrefix("header.") -> v
      }.toMap

      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] =
        Array.tabulate(numPartitions)(i =>
          HttpInputPartition(i, numPartitions): InputPartition)

      override def createReaderFactory(): PartitionReaderFactory =
        new HttpReaderFactory(url, schema.toDDL, pageSize,
          offsetParam, limitParam, headers)
    }
}

/** Strided page range: this partition owns pages idx, idx+stride, … */
private[sources] case class HttpInputPartition(idx: Int, stride: Int)
    extends InputPartition

private[sources] class HttpReaderFactory(
    url: String, schemaDdl: String, pageSize: Int,
    offsetParam: String, limitParam: String, headers: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HttpInputPartition]
    new HttpPartitionReader(url, schemaDdl, pageSize, offsetParam, limitParam,
      headers, p.idx, p.stride)
  }
}

private[sources] class HttpPartitionReader(
    url: String, schemaDdl: String, pageSize: Int,
    offsetParam: String, limitParam: String, headers: Map[String, String],
    firstPage: Int, stride: Int)
    extends PartitionReader[InternalRow] {

  private val schema = StructType.fromDDL(schemaDdl)
  private val parser = new JacksonParser(
    schema, new JSONOptions(Map.empty[String, String], "UTC", ""),
    allowArrayAsStructs = true, Seq.empty)
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30)).build()

  private var page = firstPage
  private var exhausted = false
  private var rows: Iterator[InternalRow] = Iterator.empty

  private def fetchPage(p: Int): Seq[InternalRow] = {
    val sep = if (url.contains("?")) "&" else "?"
    val pageUrl = s"$url$sep$offsetParam=${p.toLong * pageSize}&$limitParam=$pageSize"
    val b = HttpRequest.newBuilder(URI.create(pageUrl)).GET()
      .timeout(Duration.ofSeconds(60))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"graft-http GET $pageUrl failed: HTTP ${resp.statusCode()}")
    parser.parse[String](resp.body(),
      CreateJacksonParser.string(_: JsonFactory, _: String),
      UTF8String.fromString).toSeq
  }

  override def next(): Boolean = {
    while (!rows.hasNext && !exhausted) {
      val fetched = fetchPage(page)
      // A short page is the end of the relation: every later page —
      // anyone's stride — is empty, so this reader can stop.
      if (fetched.size < pageSize) exhausted = true
      page += stride
      rows = fetched.iterator
    }
    rows.hasNext
  }

  override def get(): InternalRow = rows.next()
  override def close(): Unit = ()
}
