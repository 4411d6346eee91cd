package graft

import org.apache.spark.sql.functions._

/** Attribution probe for ts_resample's scaling: time the registered query
  * (which ends in the oracle contract's global ORDER BY) against the same
  * pipeline WITHOUT the final sort — the form a production caller writes
  * to a partitioned sink. `sbt "runMain graft.SweepResample <sfDir> [reps]"`.
  *
  * Produces the PERF.md row separating the operator's cost (grid join +
  * per-user LOCF window, linear in rows) from the benchmark harness's
  * total-order requirement (O(n log n) range-sort of the whole grid).
  */
object SweepResample {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SweepResample <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = LocalSession.create("32")

    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sweep-resample] $label%-12s ${secs.min}%.2f s (min of $reps)")
    }

    time("sorted", SparkEntry.queries("ts_resample")(spark, dir))
    // identical pipeline, no global ORDER BY
    time("unsorted", queries.EventTime.resampleHourly(Tables.events(spark, dir)))
    // Stage isolation (r10): is the linear floor the events SCAN+AGG or
    // the grid EXPLODE? scan+agg is the hourly aggregate alone; grid adds
    // the per-user bounds + sequence() explode on top of it (without the
    // join/LOCF). grid − scan+agg ≈ the explode's own cost; if that gap
    // is small, the pipeline is scan-bound and the span-pruned grid
    // (first→last event per user) is doing its job — no empty-user rows,
    // no whole-corpus-span grids.
    def hourly = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    time("scan+agg", hourly)
    time("grid", hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("t0"), max(col("hour")).as("t1"))
      .select(col("user_id"),
        explode(sequence(col("t0"), col("t1"), expr("interval 1 hour")))
          .as("hour")))
    spark.stop()
  }
}
