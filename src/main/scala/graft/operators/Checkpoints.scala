package graft.operators

import org.apache.spark.sql.DataFrame

/** Release discipline for iterative DataFrame-resident state.
  *
  * The Dataset API has no explicit release for `localCheckpoint`ed
  * state (blocks live until the ContextCleaner GCs the RDD), so
  * iterative algorithms that checkpoint each round (Ivf's Lloyd,
  * PageRank) would keep EVERY round's state block-manager resident
  * until a GC happens to run — at odds with their O(state) residency
  * claims. [[free]] walks the analyzed plan's `LogicalRDD` leaves and
  * unpersists directly; callers must only pass state nothing downstream
  * will recompute from.
  */
object Checkpoints {
  /** No-op on non-checkpoint plans. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
