package graft

import org.apache.spark.sql.functions._

import graft.operators.EditDistJoin

/** Decade lane for the exact PassJoin edit-distance join: price the
  * blocked form across fixture scales, with the quadratic brute force
  * measured ONLY at the dial where it is affordable (the
  * SweepSubstring pattern — the baseline's cost curve is the point,
  * not a number to re-pay at every decade).
  * `sbt "runMain graft.SweepEditDist <sfDir> [mode] [reps]"`,
  * mode ∈ {blocked, both}.
  */
object SweepEditDist {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SweepEditDist <sfDir> [blocked|both] [reps]")
    val dir = args(0)
    val mode = if (args.length > 1) args(1) else "blocked"
    // a typo'd mode must fail loudly, not silently run blocked-only and
    // mislabel the sweep row (the round-14 SweepEmbedDedup advice class)
    require(Set("blocked", "both").contains(mode),
      s"mode must be blocked|both, got '$mode'")
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = LocalSession.create("32")

    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        substring(col("text"), 1, 120).as("t"))
    val n = docs.count()

    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val pairs = mk.count()
        ((System.nanoTime() - t0) / 1e9, pairs)
      }
      val best = runs.minBy(_._1)
      println(f"[sweep-editdist] $label%-8s docs=$n%d pairs=${best._2}%d " +
        f"${best._1}%.2f s (min of $reps)")
    }

    time("blocked", EditDistJoin.pairs(docs, 8))
    if (mode == "both") time("brute", EditDistJoin.bruteForcePairs(docs, 8))
    spark.stop()
  }
}
