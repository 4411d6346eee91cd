package graft

/** Batch plan-inspection aid for the optimization rounds: execute the
  * named registered queries in ONE session (bench-lane order and
  * configuration, so shared caches behave as in the bench) and write
  * each query's `.explain("formatted")` FINAL adaptive plan to
  * `<outDir>/<query>_<suffix>.txt` — the before/after artifacts the
  * optimization report cites.
  *
  * `sbt "runMain graft.PlanDumpMany <outDir> <suffix> <sfDir> <q1> [q2 ...]"`
  */
object PlanDumpMany {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDumpMany <outDir> <suffix> <sfDir> <query...>")
    val (outDir, suffix, sfDir) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq.sorted // bench sweep order
    val spark = LocalSession.create("4",
      Map("spark.sql.adaptive.enabled" -> "true"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      spark.sparkContext.setJobDescription(s"plandump: $name")
      df.write.format("noop").mode("overwrite").save()
      // the noop write finalizes ITS OWN QueryExecution; re-run the
      // frame's one so the printed plan is the finalized AQE plan
      df.collect()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      System.err.println(s"[plandump] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
