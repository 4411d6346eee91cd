package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All tables are plain parquet scans except `events`, whose `ts` column is
  * parquet TIMESTAMP(NANOS): Spark 4.x refuses it (`PARQUET_TYPE_ILLEGAL`)
  * unless `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces the
  * column as LongType nanos. We convert to a microsecond TimestampType
  * (`timestamp_micros(ts div 1000)`) — the same truncation DuckDB's
  * `ts::TIMESTAMP` performs — so all event-time logic and oracle comparisons
  * are in microseconds (SURVEY.md §7.4 hazard 1).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with `ts` already converted to a µs-precision timestamp. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
