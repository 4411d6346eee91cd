package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the scale path for interval joins with NO equi
  * key. `join_range` keeps a hash join only because user_id rides along
  * as an equi component; drop the key and Spark's only plan is a
  * broadcast-nested-loop — O(n·m) at any scale.
  *
  * Binning restores an equi key: time is cut into `binSeconds` buckets,
  * each probe row replicates into every bucket its window [t0, t0+len)
  * can touch (⌈len/bin⌉+1 buckets — bounded, chosen by the caller), the
  * build side lands in exactly ONE bucket, and the join is a plain hash
  * join on the bucket id with the exact predicate as a residual filter.
  * Each (probe, build) pair meets in at most one bucket (the build row's
  * own), so no dedup pass is needed. This is the classic interval-
  * binning rewrite every range-join engine implements natively.
  */
object RangeJoin {
  /** For each `probe` row, the `build` rows with
    * `probeTime <= buildTime < probeTime + windowSeconds`, joined WITHOUT
    * an equi key. Output: all probe columns + build columns.
    * `binSeconds` defaults to the window length (2 bins per probe row).
    */
  def window(probe: DataFrame, probeTime: Column,
             build: DataFrame, buildTime: Column,
             windowSeconds: Long, binSeconds: Long = 0L): DataFrame = {
    val bin = if (binSeconds > 0) binSeconds else windowSeconds
    val nBins = (windowSeconds + bin - 1) / bin + 1
    val pBin = floor(unix_timestamp(probeTime) / bin).cast("long")
    val probeBinned = probe.withColumn("__bin",
      explode(sequence(pBin, pBin + lit(nBins - 1))))
    val buildBinned = build.withColumn("__bin",
      floor(unix_timestamp(buildTime) / bin).cast("long"))
    probeBinned.join(buildBinned, Seq("__bin"))
      .filter(buildTime >= probeTime &&
        buildTime < probeTime + expr(s"INTERVAL $windowSeconds SECONDS"))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join without an equi key: pairs where
    * `[aStart, aEnd)` and `[bStart, bEnd)` intersect
    * (`aStart < bEnd && bStart < aEnd`). BOTH sides replicate into
    * every bin their interval touches, so a pair can meet in several
    * bins — unlike [[window]] a dedup IS needed, which is why the
    * caller supplies the two key columns (`aId`, `bId`) identifying a
    * pair. Candidates are bounded by interval-length/bin replication
    * (caller picks `binSeconds` ≈ typical interval length: shorter
    * bins = more replicas but fewer false candidates per bin).
    */
  def overlap(a: DataFrame, aId: String, aStart: Column, aEnd: Column,
              b: DataFrame, bId: String, bStart: Column, bEnd: Column,
              binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    // Bin math runs at MICROsecond precision: unix_timestamp truncates to
    // whole seconds, so an interval with a sub-second endpoint (e.g.
    // e = 100.9s, bin = 10s) would compute floor((100-1)/10) = bin 9 and
    // silently miss bin 10 it actually touches — a false negative.
    val binMicros = binSeconds * 1000000L
    def binned(df: DataFrame, s: Column, e: Column): DataFrame = {
      val sBin = floor(unix_micros(s.cast("timestamp")) / binMicros).cast("long")
      // end is EXCLUSIVE: an interval ending exactly on a bin edge does
      // not touch that bin — hence the -1 (one microsecond) before floor.
      val eBin = floor((unix_micros(e.cast("timestamp")) - 1) / binMicros).cast("long")
      // Empty/inverted intervals (e <= s) put eBin below sBin, and
      // sequence() would silently DESCEND, replicating the row into bins
      // the interval never touches. Clamp to the start bin: any pair the
      // residual overlap predicate keeps with an inverted side satisfies
      // bStart < aEnd <= aStart < bEnd, so aStart lies inside b's
      // replicated span and the pair still meets in a's start bin.
      df.withColumn("__bin", explode(sequence(sBin, greatest(sBin, eBin))))
    }
    binned(a, aStart, aEnd).join(binned(b, bStart, bEnd), Seq("__bin"))
      .filter(aStart < bEnd && bStart < aEnd)
      .drop("__bin")
      .dropDuplicates(aId, bId)
  }
}
