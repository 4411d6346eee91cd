package graft

import org.apache.spark.sql.SparkSession

/** One bootstrap for every driver/diagnostic main (Verify, Bench,
  * PlanDump, ScaleUp, the Sweep/Profile/RowCount probes): local master
  * sized by SPARK_GRAFT_CPUS, shuffle partitions matched to cores, UTC,
  * no UI, WARN logs. Each main previously copied this block and the
  * copies had already drifted (SweepIvf lost the UTC timezone, only
  * ScaleUp carried the nanos conf) — a config tweak must land in exactly
  * one place.
  */
object LocalSession {
  def create(defaultCpus: String = "32",
             extra: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
