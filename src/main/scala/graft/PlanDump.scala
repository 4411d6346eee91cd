package graft


/** Plan-inspection aid: execute a registered query and print its final
  * adaptive physical plan (the artifact PERF.md and PlanSpec reason
  * about). `sbt "runMain graft.PlanDump <query> [sfDir]"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = LocalSession.create("8")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // finalise the adaptive plan on THIS QueryExecution
    println(s"=== $name: executed plan ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
