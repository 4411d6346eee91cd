package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  /** Mersenne prime 2^61 − 1: modulus for the hash permutations.
    * Shared with [[StreamingMinHash]] so stream and batch signatures are
    * bit-identical.
    */
  /** 2³¹−1 (Mersenne), NOT 2⁶¹−1 — a round-15 root-cause fix. With
    * 32-bit shingle hashes and 31-bit coefficients, h·a + b < 4·(2⁶¹−1),
    * so the old 61-bit modulus folded AT MOST THREE TIMES and the
    * ordering of (h·a + b) mod P stayed essentially the ordering of h —
    * the 64 "independent" permutations all picked (nearly) the same
    * argmin shingle, a pair agreed on ~all bands or ~none, and the
    * banding bound 1−(1−s^r)^b was VOID: an adversarial template corpus
    * measured 11.6% of jac≈0.8 pairs missed in ALL 16 bands, with
    * per-pair signature agreement as low as 9/64 where ≈51/64 is the
    * estimator's mean (SweepPipeline debug lane, PERF.md round-15).
    * Near-identical driver fixtures (jac→1) masked it — the min shingle
    * is almost always shared at jac≈1. With a 31-bit modulus the product
    * wraps ~2³² times, restoring per-permutation mixing (the standard
    * 2-universal construction over a 32-bit hash universe).
    */
  private[graft] val Prime = 2147483647L

  /** Deterministic permutation coefficients from a fixed seed. */
  private[operators] def coeffs(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((rnd.nextInt(Int.MaxValue).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** The adaptive band dial: the FEWEST bands (= cheapest run — the
    * bucket relation is n·bands rows, and bands is the multiplier on
    * every candidate-side cost) whose false-negative probability at the
    * caller's similarity threshold stays within `maxMiss`.
    *
    * For a pair with Jaccard similarity s, banding `numHashes` hashes
    * into b bands of r = numHashes/b rows misses the pair with
    * probability (1 − s^r)^b. Fewer bands ⇒ larger r ⇒ a sharper
    * threshold curve shifted RIGHT (misses more true pairs near the
    * threshold) but fewer buckets to shuffle and fewer false-positive
    * candidates to verify. This scans the divisors of `numHashes` in
    * ascending band count and returns the first meeting the bound —
    * replacing the manual sweep-table guidance with the closed form the
    * sweep was sampling. At the 64-hash default: threshold 0.9 → 8
    * bands, 0.8 → 16 (the registered queries' hand-picked dial), 0.7 →
    * 16, 0.6 → 32, 0.5 → 32.
    *
    * Throws when even r = 1 (every hash its own band, miss probability
    * (1 − s)^numHashes) cannot meet the bound: then `numHashes` itself
    * is too small for the threshold — raise it; no banding can help.
    */
  def bandsFor(threshold: Double, numHashes: Int = 64,
               maxMiss: Double = 0.02): Int = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(maxMiss > 0.0 && maxMiss < 1.0,
      s"maxMiss must be in (0, 1), got $maxMiss")
    (1 to numHashes).filter(numHashes % _ == 0)
      .find { b =>
        val r = numHashes / b
        math.pow(1.0 - math.pow(threshold, r), b) <= maxMiss
      }
      .getOrElse(throw new IllegalArgumentException(
        f"numHashes=$numHashes cannot reach miss<=$maxMiss%.3f at " +
          f"threshold=$threshold%.2f even with 1-row bands - raise numHashes"))
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
    *
    * `maxBucketSize` guards pair generation against hot band keys: a
    * bucket of k docs contributes k·(k−1)/2 pairs, so one skewed key
    * (boilerplate corpora, adversarial shingles, degenerate vocabularies)
    * goes quadratic. Buckets above the cap are dropped WHOLE (truncating
    * would be partition-order-dependent) — standard LSH practice; the
    * recall loss is confined to docs whose every matching band is
    * oversized, and [[droppedBuckets]] reports how many buckets the cap
    * removed.
    *
    * Plan shape (the r10 rewrite): ONE hash-aggregate shuffle of the
    * n·bands bucket relation into bounded per-bucket membership arrays
    * ([[graft.functions.CappedLongCollect]], ≤ 8·(cap+1) bytes per group
    * at any skew), then pairs explode MAP-SIDE from the sorted array.
    * The r2–r9 formulation — window `count() over (band, key)` + bucket
    * self-join — paid a full shuffle-SORT of the bucket relation plus a
    * sort-merge self-join on the same keys; that sort was the measured
    * n·log n term that made dedup_minhash's last decade +14% over linear
    * (92 s at 100×, PERF.md r9). A hash aggregate has no sort at any
    * input size, and the self-join disappears entirely. Non-long doc_id
    * types take the old windowed path ([[lshCandidatesWindowed]] — the
    * capped-collect buffer is a primitive long array by design).
    */
  def lshCandidates(sigs: DataFrame, bands: Int = 16,
                    maxBucketSize: Int = 500, numHashes: Int = 64): DataFrame = {
    // numHashes MUST equal the signature length `sigs` was built with —
    // the static banding can't see the runtime array size, and a
    // mismatch silently mis-bands (voiding the (1−s^r)^b bound).
    require(numHashes >= bands && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    if (sigs.schema("doc_id").dataType !=
        org.apache.spark.sql.types.LongType)
      return lshCandidatesWindowed(sigs, bands, maxBucketSize, numHashes)
    graft.functions.CappedLongCollect.groupPairs(
        bucketRows(sigs, bands, numHashes),
        Seq(col("band"), col("key")), col("doc_id"), maxBucketSize)
      .distinct()
  }

  /** The pre-r10 windowed formulation — kept as the fallback for
    * non-long doc_id types and as the equality reference in tests.
    * Sorts the full bucket relation (window over (band,key)) and
    * self-joins the surviving rows; identical pair set to
    * [[lshCandidates]] (ScaleOpsSpec pins the equality on the fixture).
    */
  private[graft] def lshCandidatesWindowed(
      sigs: DataFrame, bands: Int, maxBucketSize: Int,
      numHashes: Int): DataFrame = {
    val w = Window.partitionBy(col("band"), col("key"))
    val buckets = bucketRows(sigs, bands, numHashes)
      .withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= maxBucketSize)
      .select(col("doc_id"), col("band"), col("key"))
    buckets.alias("a")
      .join(buckets.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** (doc_id, band, key) bucket assignment rows. */
  private def bucketRows(sigs: DataFrame, bands: Int, numHashes: Int): DataFrame =
    sigs.select(
      col("doc_id"),
      posexplode(bandKeys(col("sig"), bands, numHashes)).as(Seq("band", "key")))

  /** Number of band buckets the `maxBucketSize` cap removes — cheap
    * observability for the recall/cost trade (run on cached signatures).
    */
  def droppedBuckets(sigs: DataFrame, bands: Int, maxBucketSize: Int,
                     numHashes: Int = 64): Long =
    bucketRows(sigs, bands, numHashes)
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucketSize)
      .count()

  /** Per band, one hash over that band's slice of the signature. Built as
    * a STATIC array of `bands` expressions (plan-time constants) rather
    * than `transform(sequence(...), …)`: higher-order functions are
    * CodegenFallback, so the static form keeps the banding inside
    * whole-stage codegen.
    */
  private def bandKeys(sig: Column, bands: Int, numHashes: Int): Column = {
    val r = numHashes / bands
    array((0 until bands).map(j =>
      hash(lit(j), slice(sig, j * r + 1, r))).toIndexedSeq: _*)
  }

  /** Row-local MinHash signature of one document's text — word-3-gram
    * shingles, `xxhash64` (the exact function the SQL expression calls),
    * 32-bit truncation, (a·h+b) mod p mins — computed in one tight loop
    * over the row. BIT-IDENTICAL to [[signatures]] over the corresponding
    * shingle relation (StreamingMinHashSpec equality test); shared by the
    * streaming operator and [[signaturesLocal]].
    */
  private[operators] def rowLocalSignature(
      text: String, a: Array[Long], b: Array[Long]): Array[Long] = {
    // Locale.ROOT: SQL lower() lowercases locale-independently; default-
    // locale toLowerCase would silently diverge on e.g. tr_TR JVMs.
    val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val n = a.length
    val sig = Array.fill(n)(Long.MaxValue)
    if (t.length >= 3) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i <= t.length - 3) {
        val s = s"${t(i)} ${t(i + 1)} ${t(i + 2)}"
        if (seen.add(s)) {
          val h64 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(org.apache.spark.unsafe.types.UTF8String.fromString(s),
              org.apache.spark.sql.types.StringType, 42L)
          val h32 = h64 & 0xFFFFFFFFL
          var j = 0
          while (j < n) {
            val v = (h32 * a(j) + b(j)) % Prime
            if (v < sig(j)) sig(j) = v
            j += 1
          }
        }
        i += 1
      }
    }
    sig
  }

  /** Signatures computed PER ROW from the raw text — zero shuffle (the
    * [[signatures]] path shuffles the whole shingle relation into a
    * grouped aggregate; this one is a map). Docs with no shingles
    * (<3 tokens) are dropped, matching [[signatures]] (their shingle
    * relation has no rows). The CPU trade: the text tokenizes once more
    * per row, but a full shuffle of the corpus's largest intermediate
    * disappears — the right trade at any scale where the shingle
    * relation dominates (always).
    */
  def signaturesLocal(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      numHashes: Int = 64, seed: Long = 42L): DataFrame = {
    val cs = coeffs(numHashes, seed)
    val (a, b) = (cs.map(_._1).toArray, cs.map(_._2).toArray)
    val sigUdf = udf((text: String) =>
      if (text == null) null else rowLocalSignature(text, a, b))
    docs.select(col(idCol).as("doc_id"), sigUdf(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull && element_at(col("sig"), 1) =!= Long.MaxValue)
  }

  /** End-to-end near-dup from raw documents: row-local signatures (no
    * signature shuffle) + the shared candidates/exact-verify core.
    * `shingles` must be the hashed-shingle relation of the SAME docs
    * (still needed for sizes + exact-Jaccard verification).
    *
    * The signature frame is persisted HERE (and released before
    * returning): [[verifiedPairs]] deliberately never persists a
    * caller-supplied frame, but this method built the frame itself, and
    * uncached it would run the row-local signature UDF — tokenize +
    * numHashes permutations per shingle, the pipeline's dominant CPU —
    * over the whole corpus once per consumer (candidates AND
    * droppedBuckets: 2×). Safe to release eagerly because verifiedPairs
    * localCheckpoints its result and runs droppedBuckets before
    * returning — no consumer of `sigs` survives the call.
    */
  def nearDuplicatesFromText(docs: DataFrame, shingles: DataFrame,
                             threshold: Double, numHashes: Int = 64,
                             bands: Int = 16, seed: Long = 42L,
                             maxBucketSize: Int = 500): DataFrame = {
    val sigs = signaturesLocal(docs, numHashes = numHashes, seed = seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try verifiedPairs(shingles, sigs, threshold, numHashes, bands, maxBucketSize)
    finally sigs.unpersist(false)
  }

  /** End-to-end: candidates verified against the exact shingle Jaccard.
    * `shingles` must be the same (doc_id, s) relation used for signatures.
    */
  def nearDuplicates(shingles: DataFrame, threshold: Double,
                     numHashes: Int = 64, bands: Int = 16,
                     seed: Long = 42L, maxBucketSize: Int = 500): DataFrame =
    verifiedPairs(shingles, null, threshold, numHashes, bands, maxBucketSize, seed)

  /** The shared LSH-candidates + exact-verify core. `sigsOrNull == null`
    * means "aggregate signatures from the shingle relation" (the
    * classic path); a non-null frame (doc_id, sig) is used as-is (the
    * row-local path).
    */
  private def verifiedPairs(shingles: DataFrame, sigsOrNull: DataFrame,
                            threshold: Double, numHashes: Int, bands: Int,
                            maxBucketSize: Int, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    // The shingle relation feeds signatures, sizes AND verification —
    // persist it once instead of re-running split/explode/distinct per
    // consumer. The result is materialised EAGERLY (localCheckpoint) so
    // both caches can be released before returning: near-dup output is
    // pairs-above-threshold, orders of magnitude smaller than the shingle
    // relation at any scale, so holding the result and dropping the
    // intermediates is the right memory trade (round-1 leak: the shingle
    // cache lived until the ContextCleaner got around to it).
    val sh = shingles.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Persist (and later unpersist) the signature frame ONLY when it was
    // built here: unpersisting a caller-supplied frame would evict the
    // caller's own cache as a side effect. Callers supplying sigs are
    // therefore responsible for persisting them across this call's two
    // consumers (candidates + droppedBuckets) — nearDuplicatesFromText
    // does exactly that since r9, where recomputing the signatures turned
    // out to be the pipeline's dominant CPU (117.9 → 92.0 s at 100×).
    val ownSigs = sigsOrNull == null
    val sigs =
      if (ownSigs)
        signatures(sh, numHashes, seed)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sigsOrNull
    val cand = lshCandidates(sigs, bands, maxBucketSize, numHashes)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // Verify candidates by expanding ONLY candidate pairs' shingles:
    // cand ⋈ d1-shingles, then an equi-join on (d2, s) counts the
    // intersection — the full shingle self-join never materialises.
    val inter = cand
      .join(sh.select(col("doc_id").as("d1"), col("s")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("s")), Seq("d2", "s"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("i"))
    val out = inter
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jac", round(col("i") / (col("n1") + col("n2") - col("i")), 6))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), col("jac"))
      .localCheckpoint() // eager: executes the pipeline, cuts lineage
    val dropped = droppedBuckets(sigs, bands, maxBucketSize, numHashes)
    if (dropped > 0)
      org.apache.logging.log4j.LogManager.getLogger(getClass)
        .warn(s"minhash LSH: $dropped band buckets over maxBucketSize=" +
          s"$maxBucketSize were dropped (recall loss possible)")
    if (ownSigs) sigs.unpersist(false)
    sh.unpersist(false)
    out
  }
}
