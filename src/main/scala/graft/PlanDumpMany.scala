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
      // Round-19: capture EVERY QueryExecution the query runs (the
      // PlanSpec listener discipline) — queries ending in
      // localCheckpoint() otherwise dump an 8-line ExistingRDD stub
      // (the r18 verdict's graph_pagerank complaint) because the real
      // computation executed inside the checkpoint action.
      val captured = scala.collection.mutable.ArrayBuffer[(String, String)]()
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               ns: Long): Unit =
          captured.synchronized {
            captured += fn -> qe.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            ()
          }
        override def onFailure(fn: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      val df = SparkEntry.queries(name)(spark, sfDir)
      spark.sparkContext.setJobDescription(s"plandump: $name")
      df.write.format("noop").mode("overwrite").save()
      // the noop write finalizes ITS OWN QueryExecution; re-run the
      // frame's one so the printed plan is the finalized AQE plan
      df.collect()
      // listener delivery is async — poll to quiescence (the PlanSpec
      // discipline: three consecutive quiet windows, bounded 2 s)
      var (last, stable, waited) = (-1, 0, 0)
      while (stable < 3 && waited < 2000) {
        Thread.sleep(50); waited += 50
        val n = captured.synchronized(captured.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      spark.listenerManager.unregister(listener)
      val direct = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // a checkpoint-truncated frame (one ExistingRDD leaf) carries no
      // evidence — substitute the captured per-action plans
      val txt =
        if (direct.linesIterator.size > 12) direct
        else captured.synchronized {
          captured.zipWithIndex.map { case ((fn, p), i) =>
            s"== Captured action ${i + 1}: $fn ==\n$p"
          }.mkString("\n")
        }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      System.err.println(s"[plandump] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
