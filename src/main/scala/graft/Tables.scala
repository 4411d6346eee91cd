package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All tables are plain parquet scans except `events`, whose `ts` column has
  * shipped in two physical forms across fixture generations:
  *
  *   - parquet TIMESTAMP(NANOS): Spark 4.x refuses it (`PARQUET_TYPE_ILLEGAL`)
  *     unless `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces the
  *     column as LongType nanos — we truncate to µs via
  *     `timestamp_micros(ts div 1000)` (same truncation as DuckDB's
  *     `ts::TIMESTAMP`).
  *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): read natively, as
  *     TIMESTAMP_NTZ when `parquet.inferTimestampNTZ` is on (the 3.4+
  *     default) — we cast to TimestampType, value-identical under the UTC
  *     session timezone every session factory in this repo pins.
  *
  * Branching on the surfaced type (not the fixture generation) keeps every
  * event-time query and oracle comparison in µs-precision TimestampType
  * regardless of which generation produced the file (SURVEY.md §7.4 hazard 1).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Layout-adaptive scan spreader (round-18; the optimization guide's
    * §2.5 unsplittable-input rule: "one huge unsplittable file …
    * repartition immediately after the read"). The driver fixtures are
    * SINGLE-ROW-GROUP parquet files, so a scan plans at most one task
    * per file — byte-range splits of a one-row-group file yield one
    * non-empty split — and a row-local-compute-heavy first stage
    * (tokenize / shingle / explode / hash) serializes on one core no
    * matter how many the session has. Repartition to the session's
    * default parallelism exactly when the PLANNED scan parallelism is
    * below it: on a production layout (many splittable files) the
    * condition is false and no shuffle is added — which is why this is
    * not a local-only tuning constant but the layout-adaptive form of
    * the rule. Call it AFTER projecting the needed columns, so the
    * added exchange (when it fires at all) carries only those bytes.
    * The getNumPartitions probe is plan-time only (no job runs).
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** events with `ts` already converted to a µs-precision timestamp. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => raw
      // TIMESTAMP_NTZ (micros, isAdjustedToUTC=false under inferTimestampNTZ):
      // value-identical cast under the pinned UTC session timezone. ONLY this
      // type falls through — a catch-all cast would silently mis-read the next
      // encoding drift (e.g. a millis-Long would hit the LongType branch and
      // be off 1000x, a String ts would cast to nulls); unknown types must
      // fail loudly here, in the loader, not downstream in query results.
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts surfaced as unexpected type $other — a new fixture " +
          "generation changed the physical encoding; teach Tables.events the " +
          "new form explicitly (see FixtureSchemaSpec)")
    }
  }
}
