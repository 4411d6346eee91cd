package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained-classifier serving — the scoring half of the DCLM pattern
  * whose training half is the `quality_lr` query (distill an expensive
  * quality rule into a cheap linear model in-engine, then apply it at
  * ingest). The reference (/root/reference/task.ts) has no analogue;
  * this is training-data-pipeline engine surface.
  *
  * ONE transform shared by the trainer (feature definitions), the
  * batch query (`quality_lr_score`) and the streaming form: the scorer
  * is stateless and row-local, so the IDENTICAL code path runs over a
  * static or a streaming DataFrame — stream ≡ batch by construction
  * (the annTopKSink argument), no state, no watermark. A feature
  * definition living in two places is train/serve skew, the classic
  * serving bug; both halves call [[features]].
  *
  * Weights enter as a ONE-ROW DataFrame (w0..w3), not plan literals:
  * the production shape is a model table joined in broadcast, so a
  * refreshed model is a data change, not a replan; in a streaming
  * query a file-backed static side re-resolves per micro-batch, which
  * is exactly the model-refresh story.
  *
  * Scale: features are row-local higher-order-function folds over the
  * token array, the weight join is a one-row broadcast, the sigmoid is
  * scalar math — map-only at any corpus size (PlanSpec gates the batch
  * query to zero hash exchanges).
  */
object QualityScorer {
  private def toks(c: Column): Column =
    filter(split(c, " "), (t: Column) => t =!= "")

  /** doc_id, centered features x1..x3, and the Gopher-ish rule label y
    * (ntok ≥ 50, mean word length in [3,10]) — the trainer's target,
    * free to compute here and ignored by [[score]]. Input needs
    * (doc_id, text); empty/null texts drop (no tokens → no features).
    */
  def features(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), toks(lower(col("text"))).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"),
        size(col("t")).as("ntok"),
        aggregate(col("t"), lit(0), (acc, x) => acc + length(x))
          .cast("double").as("wls"),
        size(filter(col("t"), (x: Column) => length(x) >= 5))
          .cast("double").as("nl"))
      .select(col("doc_id"),
        ((col("ntok") - 50) / 50.0).as("x1"),
        (col("wls") / col("ntok") - 4.5).as("x2"),
        (col("nl") / col("ntok") - 0.5).as("x3"),
        when(col("ntok") >= 50 &&
             col("wls") / col("ntok") >= 3.0 &&
             col("wls") / col("ntok") <= 10.0, 1.0).otherwise(0.0).as("y"))

  /** Score docs under a one-row (w0, w1, w2, w3) weight relation:
    * (doc_id, p = sigmoid(z) rounded to 6, keep = [z ≥ 0]). Works
    * unchanged on a streaming `docs` (stream-static broadcast join).
    */
  def score(docs: DataFrame, weights: DataFrame): DataFrame =
    features(docs)
      .crossJoin(broadcast(weights))
      .select(col("doc_id"),
        (col("w0") + col("w1") * col("x1") + col("w2") * col("x2") +
          col("w3") * col("x3")).as("z"))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p"),
        when(col("z") >= 0, 1L).otherwise(0L).as("keep"))
}
