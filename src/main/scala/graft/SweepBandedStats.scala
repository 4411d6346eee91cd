package graft

import org.apache.spark.sql.functions._

/** Diagnostic sweep for the generalized banded-frame aggregates: times
  * avg-only, first/last-only, and the combined form on the same joined
  * input, min of 2 passes each — isolates which pipeline dominates
  * `win_range_frame_stats` at scale. Not part of the driver contract;
  * results recorded in PERF.md.
  *
  * Usage: `sbt "runMain graft.SweepBandedStats [sfDir]"`.
  */
object SweepBandedStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession.create("32")
    def joined = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        col("o_totalprice").as("totalprice_d"))
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sweep-banded] $label%-14s min=${secs.min}%.2f s (passes: ${secs.map(s => f"$s%.2f").mkString(", ")})")
    }
    time("cnt+sum") {
      operators.BandedWindow.rangeFrame(joined, Seq("c_mktsegment"),
        "totalprice_d", 1000L, cntName = Some("c"), sumName = Some("s"))
    }
    time("minmax") {
      operators.BandedWindow.rangeFrame(joined, Seq("c_mktsegment"),
        "totalprice_d", 1000L, minName = Some("mn"), maxName = Some("mx"))
    }
    time("avg") {
      operators.BandedWindow.rangeFrame(joined, Seq("c_mktsegment"),
        "totalprice_d", 1000L, avgName = Some("a"))
    }
    time("first") {
      operators.BandedWindow.rangeFrame(joined, Seq("c_mktsegment"),
        "totalprice_d", 1000L, firstName = Some(("f", "o_orderkey")))
    }
    time("first+last") {
      operators.BandedWindow.rangeFrame(joined, Seq("c_mktsegment"),
        "totalprice_d", 1000L, firstName = Some(("f", "o_orderkey")),
        lastName = Some(("l", "o_orderkey")))
    }
    time("stats(all 3)") {
      operators.BandedWindow.rangeFrame(joined, Seq("c_mktsegment"),
        "totalprice_d", 1000L, avgName = Some("a"),
        firstName = Some(("f", "o_orderkey")), lastName = Some(("l", "o_orderkey")))
    }
    spark.stop()
  }
}
