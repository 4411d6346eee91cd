package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding — the 100 TB-scale path for shingle-Jaccard near
  * deduplication (SURVEY.md §2.3 `dedup_neardup` scale note, §7.5).
  *
  * Pipeline (all ordinary DataFrame ops — no custom strategy needed):
  *   1. shingle → 64-bit hash (`xxhash64`), truncated to 32 bits so the
  *      `(a·h + b) mod p` permutations can't overflow a long under ANSI;
  *   2. per doc, the signature = elementwise min over `numHashes`
  *      permutations — ONE map-side-combinable aggregation;
  *   3. split the signature into `bands`; docs sharing any band hash land
  *      in the same bucket (equi-join on the bucket key — the quadratic
  *      candidate space never materialises);
  *   4. candidates are verified with the EXACT Jaccard, so false
  *      positives cost only compute; false-negative probability for a
  *      pair with similarity s is (1 − s^r)^b, r = numHashes/bands.
  *
  * With the defaults (64 hashes, 16 bands of 4): P(miss | s=0.9) ≈ 1e-16,
  * P(miss | s=0.6) ≈ 0.11 — tune bands to the threshold as usual.
  */
object MinHash {
  /** Mersenne prime 2^61 − 1: modulus for the hash permutations. */
  private val Prime = (1L << 61) - 1

  /** Deterministic permutation coefficients from a fixed seed. */
  private def coeffs(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((rnd.nextInt(Int.MaxValue).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** doc_id, sig: array<long> of `numHashes` minhash values.
    * Input: (doc_id, s) distinct shingle rows. Pre-hashed long shingles
    * take the [[graft.functions.MinHashSignature]] imperative aggregate
    * (one buffer, tight loop); string shingles take the expression
    * formulation — both produce identical signatures (MinHashSpec).
    */
  def signatures(shingles: DataFrame, numHashes: Int = 64, seed: Long = 42L): DataFrame = {
    val isPreHashed = shingles.schema("s").dataType ==
      org.apache.spark.sql.types.LongType
    if (isPreHashed) {
      graft.functions.MinHashSignature.register(
        shingles.sparkSession, numHashes, seed)
      shingles.groupBy(col("doc_id"))
        .agg(call_function("minhash_sig", col("s")).as("sig"))
    } else signaturesExpr(shingles, numHashes, seed)
  }

  /** Expression formulation: `numHashes` separate min-aggregate slots. */
  def signaturesExpr(shingles: DataFrame, numHashes: Int = 64, seed: Long = 42L): DataFrame = {
    val isPreHashed = shingles.schema("s").dataType ==
      org.apache.spark.sql.types.LongType
    val h32 =
      (if (isPreHashed) col("s") else xxhash64(col("s")))
        .bitwiseAND(lit(0xFFFFFFFFL))
    val mins = coeffs(numHashes, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(h32 * lit(a) + lit(b), lit(Prime))).as(s"m$i")
    }
    shingles
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")).toIndexedSeq: _*).as("sig"))
  }

  /** Distinct candidate pairs (d1 < d2) sharing at least one LSH band.
    * `bands` must divide the signature length — integer division would
    * otherwise silently drop trailing hashes from the banding and void
    * the (1 − s^r)^b false-negative bound.
    */
  def lshCandidates(sigs: DataFrame, bands: Int = 16): DataFrame = {
    val buckets = sigs.select(
      col("doc_id"),
      posexplode(bandKeys(col("sig"), bands)).as(Seq("band", "key")))
    buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Per band, one hash over that band's slice of the signature. */
  private def bandKeys(sig: Column, bands: Int): Column = {
    // r rows per band, derived from the runtime array size.
    val r = size(sig) / bands
    transform(sequence(lit(0), lit(bands - 1)),
      (j: Column) => hash(j, slice(sig, j * r + 1, r)))
  }

  /** End-to-end: candidates verified against the exact shingle Jaccard.
    * `shingles` must be the same (doc_id, s) relation used for signatures.
    */
  def nearDuplicates(shingles: DataFrame, threshold: Double,
                     numHashes: Int = 64, bands: Int = 16,
                     seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    // The shingle relation feeds signatures, sizes AND verification —
    // persist it once instead of re-running split/explode/distinct per
    // consumer (lineage recomputation, not correctness, is the cost).
    // The cache lives until the ContextCleaner collects it (the returned
    // DataFrame is lazy, so an eager unpersist here would defeat it);
    // callers looping this in one long session should cache shingles
    // themselves and pass the cached relation in.
    val sh = shingles.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidates(signatures(sh, numHashes, seed), bands)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // Verify candidates by expanding ONLY candidate pairs' shingles:
    // cand ⋈ d1-shingles, then an equi-join on (d2, s) counts the
    // intersection — the full shingle self-join never materialises.
    val inter = cand
      .join(sh.select(col("doc_id").as("d1"), col("s")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("s")), Seq("d2", "s"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jac", round(col("i") / (col("n1") + col("n2") - col("i")), 6))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
  }
}
