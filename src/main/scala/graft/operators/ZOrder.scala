package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the data-layout operator behind
  * multi-dimensional file skipping: sort a table by the bit-interleaved
  * z-value of several columns and EVERY interleaved dimension's per-file
  * min/max range tightens, so scans filtered on ANY of those dimensions
  * prune files. Sorting by a single column tightens only that column;
  * z-ordering trades a little of that for locality in all of them.
  *
  * The z-value is a STATIC expression tree (shift/and/or terms, one per
  * bit per dimension) — whole-stage-codegen-friendly, no UDF in the
  * write path. `bits` per dimension is bounded by 63/numDims (the
  * interleaved value must fit one long).
  */
object ZOrder {
  /** Map a numeric column into [0, 2^bits) as a long, linearly between
    * lo and hi (values outside clamp). The standard per-dimension
    * normalisation before interleaving.
    */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"normalize needs hi > lo (got $lo, $hi)")
    val max = (1L << bits) - 1
    val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(max.toDouble)
    // NULL/NaN dimensions land in the TOP bucket, explicitly (greatest()
    // SKIPS nulls, so without this guard a null row would silently
    // clamp to bucket 0 and cluster with the lo end, widening those
    // files' min/max ranges — defeating the file skipping this operator
    // exists for). The top bucket keeps null rows together and away
    // from the dense range.
    when(c.isNull || isnan(c.cast("double")), lit(max))
      .otherwise(least(greatest(floor(scaled).cast("long"), lit(0L)), lit(max)))
  }

  /** Bit-interleaved z-value of already-normalised long columns (each in
    * [0, 2^bits)). Dimension 0 owns the lowest interleaved bit.
    */
  def zvalue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zvalue needs at least one dimension")
    require(bits * dims.size <= 63,
      s"bits ($bits) × dims (${dims.size}) must fit a long")
    // cast to long defensively: int-typed dims would wrap shift amounts
    // mod 32 (Java int shift semantics) and corrupt the interleave for
    // any target bit position ≥ 32
    val longDims = dims.map(_.cast("long"))
    val terms = for {
      b <- 0 until bits
      (d, i) <- longDims.zipWithIndex
    } yield shiftleft(
      shiftright(d, b).bitwiseAND(lit(1L)), b * dims.size + i)
    terms.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Cluster `df` into `numPartitions` range partitions by the z-value
    * of the given (column, lo, hi) dimensions, sorted within partitions
    * — the layout a writer would persist. At 100 TB this is the
    * pre-write step: one range exchange on a single long, and every
    * listed dimension becomes skippable at the file level.
    */
  def cluster(df: DataFrame, dims: Seq[(Column, Double, Double)],
              numPartitions: Int, bits: Int = 16): DataFrame = {
    // collision-proof temp column: withColumn would silently OVERWRITE a
    // user column named "_z" and the trailing drop would delete it
    var zCol = "_z"
    while (df.columns.contains(zCol)) zCol += "_"
    val z = zvalue(dims.map { case (c, lo, hi) => normalize(c, lo, hi, bits) }, bits)
    df.withColumn(zCol, z)
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
  }
}
