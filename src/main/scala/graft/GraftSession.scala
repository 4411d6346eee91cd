package graft

import org.apache.spark.sql.SparkSession

/** One-stop session factory with the engine's recommended configuration
  * (the settings every main/test in this repo pins by hand):
  * UTC session time, shuffle partitions sized to the machine (not the
  * 200 default), AQE on (coalescing + skew-join splitting), and the
  * [[graft.plans.GraftExtensions]] function pack (haversine_m,
  * initial_bearing, cosine_sim) pre-installed.
  */
object GraftSession {
  def builder(master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Build (or join) the session and ensure the function pack AND the
    * as-of join operator are present even when an existing session is
    * returned by getOrCreate (whose builder extensions would be ignored).
    */
  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    graft.functions.CosineSimilarity.register(spark)
    graft.plans.Asof.register(spark)
    spark
  }
}
