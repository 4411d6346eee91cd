package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document repeated-substring detection — the character-level
  * sibling of the token-shingle near-dup family (SURVEY.md §2.3
  * `dedup_substring`).
  *
  * Token-level dedup (exact, shingle-Jaccard, MinHash) misses the
  * pattern substring-level dedup targets: long VERBATIM spans repeated
  * across otherwise-different documents (boilerplate, licenses, quoted
  * passages, templated pages). The published treatment is suffix-array
  * ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better" — 50-token exact repeats); a global
  * distributed suffix array is the wrong tool on Spark (one giant
  * order-dependent structure against an unordered relational engine), so
  * this uses the equivalent k-gram formulation: two documents share a
  * repeated span of length ≥ L iff they share EVERY length-L character
  * gram inside it, so grouping the corpus by gram key finds exactly the
  * pairs with any ≥L-char verbatim overlap, and the per-pair shared-gram
  * count measures the overlap's extent (a shared span of length
  * m contributes m − L + 1 grams).
  *
  * Plan shape — the [[MinHash.lshCandidates]] r10 pattern end to end:
  *   1. per row, build the distinct 64-bit-hashed gram array with ONE
  *      `transform(sequence(...))` + `array_distinct` — per-document
  *      work, ZERO shuffle (the explode-then-global-distinct alternative
  *      shuffles n·len(text) rows; `array_distinct` makes (doc_id, g)
  *      unique within the only scope duplicates can arise — HOFs are
  *      CodegenFallback, the documented trade for deleting that shuffle);
  *   2. ONE hash-aggregate shuffle of 8-byte gram keys into capped
  *      per-gram membership arrays ([[graft.functions.CappedLongCollect]],
  *      ≤ 8·(cap+1) bytes per group at any skew — a boilerplate gram
  *      shared by k docs would otherwise build a k-array and k² pairs);
  *   3. pairs explode MAP-SIDE from the sorted array (d1 < d2 by
  *      construction), then one count aggregate per pair.
  * No sort, no self-join, no window anywhere; groups above `maxGroup`
  * are dropped WHOLE (truncation would be partition-order-dependent)
  * with [[droppedGrams]] as the observability hook.
  *
  * Collision honesty: grams are compared by xxhash64, so two DIFFERENT
  * grams can alias (P ≈ d²/2^65 for d distinct grams — ~5·10⁻¹⁰ at the
  * fixture's 10⁵, still < 10⁻⁴ at 10⁹ grams). The oracle compares
  * against exact string grams; the risk is accepted and documented, the
  * same budget the hashed-shingle Jaccard path carries.
  */
object SubstringDedup {

  /** (doc_id, g): the DISTINCT xxhash64'd `gramLen`-char grams of each
    * document, built row-locally (no shuffle — see object doc). Docs
    * shorter than `gramLen` have no grams and drop out, matching the
    * oracle's `length(text) >= gramLen` filter.
    */
  def grams(docs: DataFrame, gramLen: Int = 40,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    val text = col(textCol)
    docs
      .filter(text.isNotNull && length(text) >= gramLen)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), length(text) - lit(gramLen - 1)),
          (i: Column) => xxhash64(text.substr(i, lit(gramLen)))))).as("g"))
  }

  /** Pairs (d1 < d2, shared) of documents sharing at least `minShared`
    * distinct `gramLen`-char grams — i.e. with verbatim character-level
    * overlap of at least `gramLen + minShared - 1` chars when the shared
    * grams are contiguous (the common case), or `minShared` separate
    * `gramLen`-char repeats otherwise.
    */
  def sharedGramPairs(docs: DataFrame, gramLen: Int = 40,
                      minShared: Long = 5L, maxGroup: Int = 500,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    graft.functions.CappedLongCollect.groupPairs(
        grams(docs, gramLen, idCol, textCol),
        Seq(col("g")), col("doc_id"), maxGroup)
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** ONE builder-facing entry point for verbatim-overlap candidate
    * pairs — `dedup_substring` and `dedup_winnow` fill the same
    * contract at different density/guarantee dials, and this is where
    * the choice (and its bound) lives so callers can't pick blind:
    *
    *  - `mode = "exact"`: every position contributes a gram
    *    ([[sharedGramPairs]]). GUARANTEE: any pair sharing a verbatim
    *    span of ≥ `gramLen + minShared − 1` chars is emitted (complete
    *    at the gram level; hash-collision budget in the object doc).
    *    The densest signal and the priciest: 115.5 s at the 100×
    *    fixture decade (PERF.md).
    *  - `mode = "winnow"`: Schleimer-et-al winnowing fingerprints at
    *    ~2/(window+1) the gram density (66.3 s at 100×). GUARANTEE
    *    (conservative): any shared span of
    *    ≥ `gramLen + (minShared + 1)·window − 2` chars contains
    *    `minShared` disjoint interior gram windows, each of which
    *    selects ≥ 1 fingerprint — content-determined, hence selected
    *    identically in both documents — so the pair is emitted. Shorter
    *    overlaps are emitted best-effort, never spuriously (a shared
    *    fingerprint IS a shared gram).
    *
    * Both modes emit `(d1 < d2, shared)` through the same capped
    * bucket machinery (groups above `maxGroup` dropped whole).
    * `window` is read only by the winnow mode.
    */
  def candidates(docs: DataFrame, mode: String = "exact",
                 gramLen: Int = 40, minShared: Long = 5L, maxGroup: Int = 500,
                 window: Int = 8,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    mode match {
      case "exact" =>
        sharedGramPairs(docs, gramLen, minShared, maxGroup, idCol, textCol)
      case "winnow" =>
        graft.functions.WinnowFingerprints.register(docs.sparkSession)
        val fps = docs
          .filter(col(textCol).isNotNull &&
            length(col(textCol)) >= gramLen + window - 1)
          .select(col(idCol).as("doc_id"),
            explode(graft.functions.WinnowFingerprints(col(textCol), gramLen, window))
              .as("fp"))
        graft.functions.CappedLongCollect
          .groupPairs(fps, Seq(col("fp")), col("doc_id"), maxGroup)
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= minShared)
      case other => throw new IllegalArgumentException(
        s"SubstringDedup.candidates mode must be 'exact' or 'winnow', got '$other'")
    }

  /** Number of gram groups the `maxGroup` cap removes — the
    * [[MinHash.droppedBuckets]] analogue for the recall/cost trade.
    */
  def droppedGrams(docs: DataFrame, gramLen: Int = 40, maxGroup: Int = 500,
                   idCol: String = "doc_id", textCol: String = "text"): Long =
    grams(docs, gramLen, idCol, textCol)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxGroup)
      .count()
}
