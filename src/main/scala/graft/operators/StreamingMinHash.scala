package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the MinHash-LSH candidate stage
  * as an incremental operator: as documents arrive, each one's LSH band
  * keys probe a per-bucket state of previously-seen doc ids, and every
  * collision emits a candidate pair IMMEDIATELY (no batch re-scan of the
  * corpus). The use case is ingest-time dedup of a growing training
  * corpus: "is this new document a near-copy of anything we already
  * hold?" answered at arrival time.
  *
  * Signatures are computed row-locally (one document = one row = one
  * tight loop) but are BIT-IDENTICAL to the batch
  * [[MinHash.signatures]] path: same tokenisation as
  * `LlmOps.shingleRowsRaw` (lowercase, split on ' ', word 3-grams),
  * same `xxhash64` (via [[XxHash64Function]], the exact function the
  * SQL expression calls), same 32-bit truncation and (a·h+b) mod p
  * permutations from [[MinHash.coeffs]] — asserted by equality test
  * (StreamingSpec).
  *
  * State: one `List[Long]` of doc ids per (band, key) bucket, capped at
  * `maxBucketSize` (a hot bucket is quadratic in emissions AND
  * unbounded in state — the cap bounds both: a full bucket stops
  * emitting and storing entirely, the streaming analogue of the batch
  * path's drop-oversized-buckets-whole; below the cap the two paths
  * emit identical pair sets). Candidate pairs can repeat across
  * bands/batches by construction — the caller dedups downstream
  * (`dropDuplicates` in batch verification, or
  * `dropDuplicatesWithinWatermark` when candidates carry event time) —
  * same contract as the batch `lshCandidates` before its `distinct()`.
  */
object StreamingMinHash {
  case class Doc(doc_id: Long, text: String)
  case class CandidatePair(d1: Long, d2: Long)
  /** internal banding row (public: codegen'd encoders can't touch a
    * private class's accessors)
    */
  case class Banded(doc_id: Long, band: Int, key: Int)

  /** Word-3-gram MinHash signature of one document — the row-local twin
    * of the batch shingle→hash→min pipeline.
    */
  def signature(text: String, numHashes: Int = 64, seed: Long = 42L): Array[Long] = {
    val cs = MinHash.coeffs(numHashes, seed)
    signatureWith(text, cs.map(_._1).toArray, cs.map(_._2).toArray)
  }

  /** [[signature]] with pre-hoisted permutation coefficient arrays —
    * the per-row form shared with the batch zero-shuffle path
    * ([[MinHash.rowLocalSignature]]; coefficients are constants of
    * (numHashes, seed), so recomputing them per document would dominate
    * the hot loop).
    */
  private def signatureWith(text: String, a: Array[Long], b: Array[Long]): Array[Long] =
    MinHash.rowLocalSignature(text, a, b)

  /** Band keys of a signature (bands slices of r values each). The key
    * only needs to be deterministic WITHIN this operator — pair equality
    * with the batch path is over bucket MEMBERSHIP, not key values.
    */
  private def bandKeys(sig: Array[Long], bands: Int): Array[Int] = {
    val r = sig.length / bands
    Array.tabulate(bands) { j =>
      scala.util.hashing.MurmurHash3.arrayHash(
        sig.slice(j * r, j * r + r), j)
    }
  }

  /** Incremental candidate pairs over a document stream. Docs with
    * fewer than 3 tokens have no shingles and never match (same as the
    * batch path, whose shingle relation simply has no rows for them).
    */
  def candidatePairs(docs: Dataset[Doc], numHashes: Int = 64, bands: Int = 16,
                     seed: Long = 42L, maxBucketSize: Int = 500): Dataset[CandidatePair] = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    import docs.sparkSession.implicits._
    val cs = MinHash.coeffs(numHashes, seed)
    val (ca, cb) = (cs.map(_._1).toArray, cs.map(_._2).toArray)
    docs
      .flatMap { d =>
        val sig = signatureWith(d.text, ca, cb)
        if (sig.forall(_ == Long.MaxValue)) Iterator.empty // no shingles
        else bandKeys(sig, bands).iterator.zipWithIndex
          .map { case (k, j) => Banded(d.doc_id, j, k) }
      }
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState[List[Long], CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Int), rows: Iterator[Banded], state: GroupState[List[Long]]) =>
          var seen = state.getOption.getOrElse(List.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
          rows.foreach { b =>
            // Hot-bucket guard, aligned with the batch cap's intent
            // (batch drops oversized buckets WHOLE; a stream cannot
            // retract already-emitted pairs, so it stops the bucket at
            // the cap instead): once full, arrivals neither emit nor
            // store — emissions AND state are both bounded by cap²/2
            // per bucket. Below the cap the two paths emit identical
            // pair sets. Which docs fill the bucket first follows
            // arrival order — inherent to any online operator.
            if (seen.size < maxBucketSize && !seen.contains(b.doc_id)) {
              seen.foreach { other =>
                out += CandidatePair(math.min(b.doc_id, other), math.max(b.doc_id, other))
              }
              seen = b.doc_id :: seen
            }
          }
          state.update(seen)
          out.iterator
      }
  }
}
