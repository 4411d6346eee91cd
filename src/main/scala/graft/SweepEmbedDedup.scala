package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Recall-vs-baseline sweep for the corpus-scale embedding dedup dial
  * ([[graft.operators.EmbedDedup]]): against the exact all-pairs
  * baseline's pair set (`dedup_embed`, computed ONCE), measure each
  * (nassign × maxCellSize) grid point's pair recall, false positives
  * (structurally zero — the sweep proves it), and wall time — so the
  * `dedup_embed_cells` default dial ships with a MEASURED recall floor
  * at the capstone scale instead of a fixture-only one. Results recorded
  * in PERF.md; the chosen dial's floor is pinned in EmbedDedupSpec. Not
  * part of the driver contract; a local iteration aid like [[SweepIvf]].
  *
  * The exact baseline pair set is CACHED as parquet next to /tmp (one
  * ~470 s computation per (dir, threshold), reused across sweep runs)
  * — iterate on the grid, not the ground truth.
  *
  * Usage: `sbt "runMain graft.SweepEmbedDedup [dir] [threshold] [lsh]"`
  * — the optional `lsh` third arg skips the canopy grid (measured in
  * round 12) and runs only the LSH grid against the cached baseline.
  */
object SweepEmbedDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // first NON-FLAG trailing arg, wherever it sits — `dir lsh 0.5` must
    // run θ=0.5, not silently default (round-14 ADVICE: positional-only
    // parse mislabeled sweep rows when a flag preceded the number)
    val threshold = args.drop(1).filterNot(Set("lsh", "dialonly"))
      .headOption.map(_.toDouble).getOrElse(0.45)
    // `lsh` skips the canopy grid (measured r12); `dialonly` skips BOTH
    // grids (measured r12/r13) and runs only the round-14 lshDial row
    val dialOnly = args.contains("dialonly")
    val lshOnly = args.contains("lsh") || dialOnly
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val n = queries.ScaleOps.normalized(spark, dir)
      .select(col("vec_id"), col("e"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rows = n.count()
    val nlistAuto = operators.EmbedDedup.autoNlist(rows)
    val cachePath = s"/tmp/sweep_embed_baseline_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$threshold"
    val t0 = System.nanoTime()
    val base = (
      if (new java.io.File(cachePath).exists()) spark.read.parquet(cachePath)
      else {
        SparkEntry.queries("dedup_embed")(spark, dir)
          .select("v1", "v2").write.parquet(cachePath)
        spark.read.parquet(cachePath)
      }).persist(StorageLevel.MEMORY_AND_DISK)
    val nBase = base.count()
    println(f"[sweep-embed] dir=$dir rows=$rows nlistAuto=$nlistAuto " +
      f"baselinePairs=$nBase baselineSec=${(System.nanoTime() - t0) / 1e9}%.1f")
    // grid: cell size (nlist) is the recall lever at boundary-tight
    // thresholds (bigger cells ⇒ two 63°-apart vectors co-assign more
    // often); nassign is the cross-cell patch; cap prices hot cells
    for (nlist <- (if (lshOnly) Seq.empty[Int]
                   else Seq(nlistAuto, nlistAuto / 4, nlistAuto / 16).distinct);
         nassign <- Seq(1, 2, 3, 4); cap <- Seq(1000, 100000)) {
      val t1 = System.nanoTime()
      val pairs = operators.EmbedDedup
        .cellPairs(n, threshold, nlist = math.max(nlist, 1), maxCellSize = cap,
          nassign = nassign)
        .select("v1", "v2").persist(StorageLevel.MEMORY_AND_DISK)
      val nPairs = pairs.count()
      val dt = (System.nanoTime() - t1) / 1e9
      // intersect rather than trust orientation: recall counts only
      // pairs the baseline also emitted; falsePos must read 0
      val hit = pairs.join(base, Seq("v1", "v2")).count()
      pairs.unpersist(false)
      println(f"[sweep-embed] nlist=$nlist nassign=$nassign cap=$cap pairs=$nPairs " +
        f"recall=${hit.toDouble / math.max(nBase, 1)}%.4f " +
        f"falsePos=${nPairs - hit} sec=$dt%.1f")
    }
    // LSH grid (round 13): the boundary-tight-regime path — collision
    // calibrated to the threshold's angle instead of cluster geometry.
    // planes bound bucket sizes (anchored at the autoPlanes dial and
    // probed upward — candidate mass is n²·probes/2^planes), tables/
    // nprobe buy recall back.
    val pAuto = operators.EmbedDedup.autoPlanes(rows)
    for (planes <- (if (dialOnly) Seq.empty[Int] else Seq(pAuto, pAuto + 2, pAuto + 4));
         tables <- Seq(8, 16);
         nprobe <- Seq(0, 2)) {
      val t1 = System.nanoTime()
      val pairs = operators.EmbedDedup
        .lshPairs(n, threshold, tables = tables, planesPerTable = planes,
          nprobe = nprobe)
        .select("v1", "v2").persist(StorageLevel.MEMORY_AND_DISK)
      val nPairs = pairs.count()
      val dt = (System.nanoTime() - t1) / 1e9
      val hit = pairs.join(base, Seq("v1", "v2")).count()
      pairs.unpersist(false)
      println(f"[sweep-embed] lsh planes=$planes tables=$tables nprobe=$nprobe " +
        f"pairs=$nPairs recall=${hit.toDouble / math.max(nBase, 1)}%.4f " +
        f"falsePos=${nPairs - hit} sec=$dt%.1f")
    }
    // Recall-targeted dial row (round 14): the lshDial(rows, θ, 0.9)
    // point — the dial a caller holding a 0.9 floor would actually run
    // — with predicted-vs-measured reported, so the calibration gap is
    // a number in PERF.md, not a claim.
    {
      val (planes, tables, nprobe) =
        operators.EmbedDedup.lshDial(rows, threshold, 0.9)
      val predicted =
        operators.EmbedDedup.lshPredictedRecall(threshold, planes, tables)
      val t1 = System.nanoTime()
      val pairs = operators.EmbedDedup
        .lshPairs(n, threshold, tables = tables, planesPerTable = planes,
          nprobe = nprobe)
        .select("v1", "v2").persist(StorageLevel.MEMORY_AND_DISK)
      val nPairs = pairs.count()
      val dt = (System.nanoTime() - t1) / 1e9
      val hit = pairs.join(base, Seq("v1", "v2")).count()
      pairs.unpersist(false)
      println(f"[sweep-embed] lshDial(0.9) planes=$planes tables=$tables " +
        f"nprobe=$nprobe predicted=$predicted%.4f pairs=$nPairs " +
        f"recall=${hit.toDouble / math.max(nBase, 1)}%.4f " +
        f"falsePos=${nPairs - hit} sec=$dt%.1f")
    }
    base.unpersist(false)
    n.unpersist(false)
    spark.stop()
  }
}
