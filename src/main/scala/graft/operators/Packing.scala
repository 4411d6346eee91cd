package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — group variable-length documents into fixed token
  * budgets (the manifest step of LLM training-data preparation: packed
  * sequences feed fixed-context training without padding waste).
  *
  * The assignment rule is a running sum, not bin packing: within each
  * stream a document belongs to the pack its FIRST token falls into
  * (`floor(exclusive_prefix_sum / budget)`). Documents may straddle a
  * boundary — downstream consumers split or truncate at read time. This
  * keeps assignment a single window pass, deterministic, and exactly
  * reproducible in SQL; first-fit-decreasing style packers buy ~few %
  * less padding at the cost of a global sort + sequential state.
  *
  * Scale: the window partitions by `streamKeys` — callers MUST include a
  * shard key (e.g. `hash(id) % nShards`) alongside any semantic key, or
  * one giant stream serialises through one task. Pack ids are unique per
  * (streamKeys, pack_id), which is what a sharded writer wants anyway.
  */
object Packing {

  /** Adds `start_tok` (exclusive prefix sum of `size` in stream order)
    * and `pack_id` (= floor(start_tok / budget)) to `df`.
    */
  def packBySize(df: DataFrame, size: Column, streamKeys: Seq[Column],
                 order: Seq[Column], budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val w = Window.partitionBy(streamKeys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_tok", coalesce(sum(size).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("start_tok") / budget))
  }
}
