package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File source/sink surface (SURVEY.md §2.2 row 1): the engine reads and
  * writes parquet, ORC, CSV, JSON-lines and XML (native in Spark 4) with
  * explicit schemas — schema-on-read with a declared expected shape,
  * like the reference's TypeBox-validated ingest (task.ts:119-121), but
  * over files.
  *
  * Conventions for scale:
  *  - ALWAYS pass a schema for csv/json/xml (inference is a full extra
  *    scan);
  *  - columnar formats (parquet/orc) carry their own schema and support
  *    predicate pushdown + column pruning — they are the only formats the
  *    hot path should read;
  *  - csv/json/xml exist for ingest/interchange; timestamps are written
  *    as ISO-8601 UTC.
  */
object Formats {
  val SupportedFormats: Seq[String] = Seq("parquet", "orc", "csv", "json", "xml")

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def write(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (format match {
      case "csv" => w.option("header", "true").option("timestampFormat", TsFmt)
      case "json" => w.option("timestampFormat", TsFmt)
      case "xml" => w.option("rowTag", "row").option("timestampFormat", TsFmt)
      case _ => w
    }).save(path)
  }

  def read(spark: SparkSession, format: String, path: String,
           schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (format match {
      case "csv" => r.option("header", "true").option("timestampFormat", TsFmt)
      case "json" => r.option("timestampFormat", TsFmt)
      case "xml" => r.option("rowTag", "row").option("timestampFormat", TsFmt)
      case _ => r
    }).load(path)
  }
}
