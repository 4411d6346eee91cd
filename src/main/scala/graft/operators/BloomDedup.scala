package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Approximate-membership dedup — the ingest-time screen of the dedup
  * family (SURVEY.md §2.3 `dedup_bloom`).
  *
  * Exact dedup against a seen corpus needs a join against ALL seen keys
  * (`dedup_doc_exact`'s groupBy, or an anti-join); at ingest time the
  * right tool is a Bloom filter of the seen corpus's content hashes:
  * O(bits) memory, no shuffle of the seen side at probe time, and the
  * one-sided error the pipeline can live with — **no false negatives**
  * (a true duplicate is ALWAYS flagged), false positives at rate ~fpp
  * which the caller routes to exact verification (the MinHash
  * candidate-then-verify discipline; a screen, not a verdict).
  *
  * Scale honesty: `DataFrameStatFunctions.bloomFilter` aggregates
  * partial filters distributed, then merges them ON THE DRIVER — driver
  * memory is the filter's bit array (≈ 1.44·n·log2(1/fpp) bits ≈ 1.2 GB
  * at 10⁹ items / 1% fpp). That is the documented ceiling of THIS
  * helper: past ~10⁹ seen keys, shard the seen corpus into k key-range
  * blooms probed in sequence (bits stay constant per executor via
  * broadcast), or raise fpp — the no-false-negative guarantee and the
  * verify step are unaffected. The probe side never shuffles either way.
  *
  * Determinism: Spark's BloomFilter hashes with fixed-seed Murmur3 and
  * the bit array is a pure function of the inserted key SET, so
  * `maybe_seen` is partitioning-invariant (spec-gated).
  */
object BloomDedup {

  /** Flag each `incoming` row whose `hashCol` (LONG content hash) the
    * Bloom filter built over `seen`'s `hashCol` might contain.
    * Adds column `maybe_seen`; guarantees: every incoming hash present
    * in `seen` is flagged true; a true-false flag is always correct.
    */
  def flagMaybeSeen(spark: SparkSession, seen: DataFrame, incoming: DataFrame,
                    hashCol: String, expectedItems: Long,
                    fpp: Double): DataFrame =
    probe(spark, seen.stat.bloomFilter(hashCol, expectedItems, fpp),
      incoming, hashCol)

  /** The probe half alone, over a prebuilt filter — ONE definition of
    * the broadcast-map probe, shared with `SweepBloom` so the sweep
    * measures exactly the operator's semantics.
    */
  def probe(spark: SparkSession, bf: BloomFilter, incoming: DataFrame,
            hashCol: String): DataFrame = {
    val bc = spark.sparkContext.broadcast(bf)
    val maybe = udf((h: Long) => bc.value.mightContainLong(h))
    incoming.withColumn("maybe_seen", maybe(col(hashCol)))
  }

  /** The registered-query shape: split `docs` at `splitId` into seen
    * (doc_id < splitId) and incoming, hash text with xxhash64, screen
    * incoming through the seen bloom, and join back the EXACT verdict
    * (left-semi against distinct seen hashes) so the output carries the
    * screen's confusion cells: `maybe_seen`, `exact_dup`, and
    * `is_fp = maybe_seen AND NOT exact_dup`. The exact column is what a
    * production pipeline computes only FOR THE FLAGGED SUBSET; here it
    * is computed for every row so the spec can assert the
    * no-false-negative guarantee over the whole relation.
    */
  def screenReport(spark: SparkSession, docs: DataFrame, splitId: Long,
                   fpp: Double = 0.01): DataFrame = {
    // The hashed relation has three consumers (the eager bloomFilter
    // job, the exact seen-set, the probe side) — persist + try/finally
    // release after the eager checkpoint, the repo's multi-consumer
    // discipline, so the documents scan+hash runs once, not three times.
    val hashed = docs.select(col("doc_id"), xxhash64(col("text")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seen = hashed.filter(col("doc_id") < splitId)
      val incoming = hashed.filter(col("doc_id") >= splitId)
      val seenSet = seen.select(col("h")).distinct()
        .withColumn("exact_dup", lit(true))
      flagMaybeSeen(spark, seen, incoming, "h", math.max(splitId, 1L), fpp)
        .join(broadcast(seenSet), Seq("h"), "left")
        .select(col("doc_id"), col("h"), col("maybe_seen"),
          coalesce(col("exact_dup"), lit(false)).as("exact_dup"))
        .withColumn("is_fp", col("maybe_seen") && !col("exact_dup"))
        .localCheckpoint()
    } finally { hashed.unpersist(false); () }
  }
}
