package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: resampling after a
  * repartition, a retry, or on another cluster yields a DIFFERENT subset.
  * Hash-based sampling keys the decision on the ROW (a stable id), so
  * the same row always lands on the same side — reproducible across
  * runs, clusters and partitionings, joinable against other hash-sampled
  * tables, and cheap (no shuffle, pure map).
  */
object Sampling {
  private val Buckets = 1000000L

  /** Stable per-row bucket in [0, 1e6) from the id column and seed.
    * CONTRACT: `id` must be non-null — all null ids hash to one constant
    * bucket (xxhash64 skips null inputs), so the whole null class would
    * be kept or dropped wholesale, skewing rates and splits.
    */
  def bucket(id: Column, seed: Long): Column =
    pmod(xxhash64(id, lit(seed)), lit(Buckets))

  /** Keep ~`fraction` of rows, decided by hash(id, seed). */
  def bernoulli(df: DataFrame, id: Column, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(bucket(id, seed) < (fraction * Buckets).toLong)
  }

  /** Per-stratum fractions (e.g. downsample dominant languages):
    * unlisted strata keep `defaultFraction`.
    */
  def stratified(df: DataFrame, id: Column, stratum: Column,
                 fractions: Map[String, Double], defaultFraction: Double,
                 seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(stratum === k, lit(f)).otherwise(acc)
    }
    df.filter(bucket(id, seed) < (frac * Buckets).cast("long"))
  }

  /** Deterministic train/validation/test split: returns (assignment
    * column expression) — split boundaries in per-mille of the hash space.
    */
  def split(id: Column, trainPct: Double, valPct: Double, seed: Long = 42L): Column = {
    val b = bucket(id, seed)
    when(b < (trainPct * Buckets).toLong, "train")
      .when(b < ((trainPct + valPct) * Buckets).toLong, "val")
      .otherwise("test")
  }

  /** Deterministic EXACT-k per stratum: rank rows inside each stratum by
    * `md5(id)` — a stable, uniformly-scrambling order — and keep the
    * first k (`rk` column = 1..k). Unlike [[stratified]] (a RATE per
    * stratum, so counts fluctuate), this pins the count, which is what
    * eval-set carving and per-language quota sampling need. md5 rather
    * than xxhash64 because its output is identical in every engine
    * (reproducible outside Spark); the window shuffles one stratum per
    * task, so strata must individually fit an executor — for huge strata
    * sample down with [[bernoulli]] first.
    */
  def stratifiedK(df: DataFrame, stratum: Seq[Column], id: Column,
                  k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum: _*)
      .orderBy(md5(id.cast("string").cast("binary")), id)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
