package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SimHash — 64-bit similarity fingerprints for near-dup detection at
  * scale (the "one long per document" alternative to MinHash when memory
  * per doc matters more than Jaccard fidelity).
  *
  * Per document: every token hashes to 64 bits; each bit position
  * accumulates +1/−1 across tokens; the sign of each accumulator becomes
  * that bit of the fingerprint. Similar token multisets ⇒ small Hamming
  * distance. Candidate generation partitions the 64 bits into `bands`
  * chunks — two docs within Hamming distance d < bands share at least one
  * exact chunk (pigeonhole), so bucketing on chunks is exact for
  * d ≤ bands − 1, not probabilistic.
  */
object SimHash {
  /** doc_id, sim: the 64-bit fingerprint as a long.
    * Input: (doc_id, w) token rows (NOT distinct — multiplicity weights).
    */
  def fingerprints(tokens: DataFrame): DataFrame = {
    val h = xxhash64(col("w"))
    // One ±1 accumulator per bit, all in a single hash-aggregate pass.
    val sums = (0 until 64).map { i =>
      sum(when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    val bits = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }
    tokens
      .groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), bits.reduce(_.bitwiseOR(_)).as("sim"))
  }

  /** Row-local fingerprint of one document's text — same tokenisation as
    * the `tokens` feed (lowercase, split on ' ', empties dropped,
    * multiplicity kept), same `xxhash64`, same ±1/sign rule, computed in
    * one loop over the row. The ±1 accumulation is an integer sum, so
    * order of accumulation cannot change the result — bit-identical to
    * [[fingerprints]] by construction (equality-tested in ScaleOpsSpec).
    * Returns null for token-less docs (the grouped form has no row for
    * them).
    */
  private[operators] def fingerprintLocal(text: String): java.lang.Long = {
    val t = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val acc = new Array[Long](64)
    var any = false
    t.foreach { w =>
      if (w.nonEmpty) {
        any = true
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(org.apache.spark.unsafe.types.UTF8String.fromString(w),
            org.apache.spark.sql.types.StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
    }
    if (!any) null
    else {
      var sim = 0L
      var i = 0
      while (i < 64) { if (acc(i) > 0) sim |= (1L << i); i += 1 }
      java.lang.Long.valueOf(sim)
    }
  }

  /** Fingerprints computed PER ROW from raw text — zero shuffle (the
    * grouped form shuffles the whole token relation into a 64-slot
    * aggregate). SimHash needs nothing else per doc, so the entire
    * pipeline before the band self-join becomes a map.
    */
  def fingerprintsLocal(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val fpUdf = udf((text: String) =>
      if (text == null) null else fingerprintLocal(text))
    docs.select(col(idCol).as("doc_id"), fpUdf(col(textCol)).as("sim"))
      .filter(col("sim").isNotNull)
  }

  /** Hamming distance between two fingerprints. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  /** [[nearDuplicates]] from raw documents via the zero-shuffle
    * [[fingerprintsLocal]].
    */
  def nearDuplicatesFromText(docs: DataFrame, maxDist: Int = 3, bands: Int = 4,
                             maxBucketSize: Int = 500): DataFrame =
    pairsFromFingerprints(fingerprintsLocal(docs), maxDist, bands, maxBucketSize)

  /** Pairs (d1 < d2) with Hamming distance ≤ maxDist. Exact (pigeonhole)
    * when maxDist ≤ bands − 1.
    *
    * `maxBucketSize` mirrors [[MinHash.lshCandidates]]: one hot band
    * chunk (near-identical boilerplate corpora hash to the same 16-bit
    * slice) makes the self-join quadratic, so oversized buckets are
    * dropped whole. For d ≤ bands−1 exactness this is the ONE source of
    * false negatives — and only for docs whose every matching chunk is
    * hot.
    */
  def nearDuplicates(tokens: DataFrame, maxDist: Int = 3, bands: Int = 4,
                     maxBucketSize: Int = 500): DataFrame =
    pairsFromFingerprints(fingerprints(tokens), maxDist, bands, maxBucketSize)

  private def pairsFromFingerprints(fp: DataFrame, maxDist: Int, bands: Int,
                                    maxBucketSize: Int): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val w = Window.partitionBy(col("band"), col("key"))
    val keyed = fp.select(col("doc_id"), col("sim"),
      posexplode(array((0 until bands).map(j =>
        shiftright(col("sim"), j * width).bitwiseAND(lit(mask))).toIndexedSeq: _*))
        .as(Seq("band", "key")))
      .withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= maxBucketSize)
      .select(col("doc_id"), col("sim"), col("band"), col("key"))
    keyed.alias("a")
      .join(keyed.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sim").as("sim1"), col("b.sim").as("sim2"))
      .distinct()
      .withColumn("dist", hamming(col("sim1"), col("sim2")))
      .filter(col("dist") <= maxDist)
      .select(col("d1"), col("d2"), col("dist"))
  }
}
