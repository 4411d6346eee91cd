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
    *
    * `carry` columns pass through untouched: a pipeline gating on the
    * score keeps the doc payload alongside it ROW-LOCALLY instead of
    * paying a corpus-sized doc_id join-back after scoring — the
    * difference between a map-only keep-gate and an extra shuffle at
    * every serving site (pipeline_end2end_full's stage 5).
    */
  def features(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    // the _qs_ prefix protects the WORKING columns from carry
    // collisions, but the OUTPUT-contract columns need the same guard:
    // a carry named doc_id/x1..x3/y (or p/keep — score() builds on this
    // frame) would silently produce duplicate column names and break
    // any downstream by-name select (ADVICE r13). Fail loudly at
    // construction instead.
    val reserved = Seq("doc_id", "x1", "x2", "x3", "y", "p", "keep")
    val clash = carry.intersect(reserved)
    require(clash.isEmpty,
      s"carry columns collide with the scorer output contract: ${clash.mkString(", ")}")
    val c = carry.map(col)
    // working columns are _qs_-prefixed so an arbitrary carry column
    // (e.g. the pipeline's own "ntok") can never collide with them;
    // only doc_id / x1..x3 / y are the output contract
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id") +: toks(lower(col("text"))).as("_qs_t") +: c: _*)
      .filter(size(col("_qs_t")) > 0)
      .select(col("doc_id") +:
        size(col("_qs_t")).as("_qs_ntok") +:
        aggregate(col("_qs_t"), lit(0), (acc, x) => acc + length(x))
          .cast("double").as("_qs_wls") +:
        size(filter(col("_qs_t"), (x: Column) => length(x) >= 5))
          .cast("double").as("_qs_nl") +: c: _*)
      .select(col("doc_id") +:
        ((col("_qs_ntok") - 50) / 50.0).as("x1") +:
        (col("_qs_wls") / col("_qs_ntok") - 4.5).as("x2") +:
        (col("_qs_nl") / col("_qs_ntok") - 0.5).as("x3") +:
        when(col("_qs_ntok") >= 50 &&
             col("_qs_wls") / col("_qs_ntok") >= 3.0 &&
             col("_qs_wls") / col("_qs_ntok") <= 10.0, 1.0).otherwise(0.0).as("y") +:
        c: _*)
  }

  /** Score docs under a one-row (w0, w1, w2, w3) weight relation:
    * (doc_id, p = sigmoid(z) rounded to 6, keep = [z ≥ 0], carry...).
    * Works unchanged on a streaming `docs` (stream-static broadcast
    * join).
    */
  def score(docs: DataFrame, weights: DataFrame,
            carry: Seq[String] = Nil): DataFrame = {
    val c = carry.map(col)
    features(docs, carry)
      .crossJoin(broadcast(weights))
      .select(col("doc_id") +:
        (col("w0") + col("w1") * col("x1") + col("w2") * col("x2") +
          col("w3") * col("x3")).as("_qs_z") +: c: _*)
      .select(col("doc_id") +:
        round(lit(1.0) / (lit(1.0) + exp(-col("_qs_z"))), 6).as("p") +:
        when(col("_qs_z") >= 0, 1L).otherwise(0L).as("keep") +: c: _*)
  }
}
