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

  /** Hamming distance between two fingerprints. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

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
                     maxBucketSize: Int = 500): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val fp = fingerprints(tokens)
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
