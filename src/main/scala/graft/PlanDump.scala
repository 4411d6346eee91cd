package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection aid: execute a registered query and print its final
  * adaptive physical plan (the artifact PERF.md and PlanSpec reason
  * about). `sbt "runMain graft.PlanDump <query> [sfDir]"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // finalise the adaptive plan on THIS QueryExecution
    println(s"=== $name: executed plan ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
