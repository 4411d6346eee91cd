package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** HTTP source/sink mirroring the reference's network boundary
  * (GET task.ts:112-117; POST task.ts:216), kept OUT of the correctness
  * harness (no network there — SURVEY.md §7.1 phase 4).
  *
  * Source: one GET = one full snapshot of the relation, fetched
  * driver-side and parallelised immediately — the honest Spark shape for
  * an API that returns a single JSON array. A partitioned DataSource V2
  * is the right escalation once the upstream API supports offset reads;
  * for file-shaped inputs `spark.read.json/parquet` already scales.
  *
  * Sink: partition-parallel POSTs via `foreachPartition`, one connection
  * per partition — the distributed analogue of the reference's single
  * `submit`.
  */
object HttpJson {

  private def client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()

  /** GET `url` (optional header map, e.g. X-API-KEY) and decode the JSON
    * array payload against `schema`.
    */
  def source(spark: SparkSession, url: String, schema: StructType,
             headers: Map[String, String] = Map.empty): DataFrame = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val body = client.send(b.build(), HttpResponse.BodyHandlers.ofString()).body()
    val df = DroneSense.parseJson(spark, body)
    // Re-assert the expected schema (cheap; schema-on-read contract).
    require(df.schema.fieldNames.sameElements(schema.fieldNames),
      s"payload schema ${df.schema.simpleString} != expected ${schema.simpleString}")
    df
  }

  /** POST each partition's rows as a JSON-lines body to `url`. */
  def sink(df: DataFrame, url: String, headers: Map[String, String] = Map.empty): Unit = {
    val headerSeq = headers.toSeq
    df.toJSON.foreachPartition { (rows: Iterator[String]) =>
      if (rows.nonEmpty) {
        val body = rows.mkString("\n")
        val b = HttpRequest.newBuilder(URI.create(url))
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .header("Content-Type", "application/json")
        headerSeq.foreach { case (k, v) => b.header(k, v) }
        val resp = HttpClient.newHttpClient()
          .send(b.build(), HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() / 100 == 2, s"sink POST failed: ${resp.statusCode()}")
      }
    }
  }
}
