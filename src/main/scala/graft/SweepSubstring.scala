package graft

import org.apache.spark.sql.functions._

/** Attribution probe for dedup_substring's scaling: isolate the gram
  * generation, the capped-collect aggregate, and the pair tail, and
  * measure the ObjectHashAggregate sort-based-fallback dial (Spark falls
  * back to SORT-based aggregation after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` in-memory
  * groups — default 128, i.e. effectively always at corpus scale; the
  * gram relation has ~one group per distinct gram).
  * `sbt "runMain graft.SweepSubstring <sfDir> [reps]"`.
  */
object SweepSubstring {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SweepSubstring <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = LocalSession.create("32")

    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sweep-substring] $label%-22s ${secs.min}%.2f s (min of $reps)")
    }

    def docs = Tables(spark, dir, "documents")
    val op = graft.operators.SubstringDedup

    time("grams (map only)", op.grams(docs))
    time("grams+agg+cap", {
      val fn = graft.functions.CappedLongCollect.register(spark, 500)
      op.grams(docs).groupBy(col("g"))
        .agg(call_function(fn, col("doc_id")).as("docs"))
        .filter(size(col("docs")).between(2, 500))
    })
    time("full pipeline", op.sharedGramPairs(docs))
    for (thr <- Seq(1 << 20, 1 << 24)) {
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      time(s"full, fallback=$thr", op.sharedGramPairs(docs))
    }
    spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.stop()
  }
}
