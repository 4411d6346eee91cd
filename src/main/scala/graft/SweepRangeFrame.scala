package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured dial for the banded RANGE-frame rewrite: time the direct
  * `rangeBetween(-1000, 0)` formulation (per-segment serial walk)
  * against `BandedWindow.rangeCountSum` on the same data, same session.
  * `sbt "runMain graft.SweepRangeFrame <sfDir> [reps]"`.
  *
  * The direct form wins at toy scale (fewer stages); the banded form's
  * parallelism is #segments × #bands instead of #segments, so it must
  * win once per-segment row counts dominate stage overhead. This main
  * produces the crossover row PERF.md cites.
  */
object SweepRangeFrame {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SweepRangeFrame <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = LocalSession.create("32")

    def joined = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        col("o_totalprice").as("totalprice_d"))
    def direct = {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("totalprice_d")).rangeBetween(-1000L, 0L)
      joined
        .withColumn("n_band", count(lit(1)).over(w))
        .withColumn("band_sum", sum(Oracle.dec(col("totalprice_d"))).over(w))
    }
    def banded = graft.operators.BandedWindow.rangeCountSum(
      joined, Seq("c_mktsegment"), "totalprice_d", 1000L, "n_band", "band_sum")

    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.agg(count(lit(1)), sum(col("n_band")), sum(col("band_sum"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[sweep] $label%-8s best=$best%.2fs  runs=${times.map(t => f"$t%.2f").mkString(",")}")
      best
    }
    // warm both code paths once before timing
    time("warmup-d", direct); time("warmup-b", banded)
    val d = time("direct", direct)
    val b = time("banded", banded)
    println(f"[sweep] dir=$dir banded/direct=${b / d}%.2f")
    spark.stop()
  }
}
