package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement harness for BOTH ANN recall/cost dials: the IVF
  * (nlist × nprobe) grid and the hyperplane-LSH (tables × planes)
  * grid, each reporting recall@5 against the brute-force oracle and
  * the MEASURED mean candidate-set size per query (exactly the pairs
  * the respective topK scores). Not part of the driver contract — a
  * local iteration aid whose output is recorded in PERF.md.
  *
  * Usage: `sbt "runMain graft.SweepIvf [sfDir]"` (default sf0.01).
  */
object SweepIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // "8" preserved from before the LocalSession extraction: recorded
    // sweep timings (PERF.md) were measured at local[8] and must stay
    // comparable run-over-run.
    val spark = LocalSession.create("8")
    graft.functions.CosineSimilarity.register(spark)

    // DF-state mode (`runMain graft.SweepIvf df [nlist]`): drives the
    // DataFrame-resident Lloyd path (Ivf.centroidsDF) at a ≥1e5-cell
    // SYNTHETIC dial and probes driver heap around training — the r11
    // evidence that centroid state never materializes on the driver
    // (the array path would hold nlist·dim doubles between rounds).
    if (args.headOption.contains("df")) {
      import operators.Ivf
      val nlist = args.drop(1).headOption.map(_.toInt).getOrElse(100000)
      val dim = 32
      val nVec = math.max((nlist * 1.1).toInt, 1000)
      def usedMB(): Long = {
        val rt = Runtime.getRuntime
        System.gc(); Thread.sleep(200); System.gc()
        (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      }
      val synth = spark.range(0, nVec).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), (d: Column) =>
          pmod(xxhash64(col("id"), d), lit(1000L)).cast("double") / 500.0 - 1.0)
          .as("e"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      synth.count()
      println(s"[dfstate] synthetic n=$nVec dim=$dim nlist=$nlist " +
        s"(array-state equivalent: ${nlist.toLong * dim * 8 / 1024 / 1024} MB " +
        "of driver-held centroids; at the autoNlist 10^6x512 dial, ~4 GB)")
      println(s"[dfstate] driver heap before train: ${usedMB()} MB")
      val t0 = System.nanoTime()
      val cents = Ivf.centroidsDF(synth, nlist, iters = 2, wProbe = 0)
      val cellCount = cents.count()
      println(f"[dfstate] rounds=${Ivf.lastRounds} cells=$cellCount " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s; " +
        s"driver heap after: ${usedMB()} MB")
      spark.stop()
      return
    }

    // Clustered-synthetic dial mode (`runMain graft.SweepIvf dialsynth
    // [target] [nlist] [n]`): the flip side of the scale-fixture dial
    // rows — the permuted-replica embeddings are near-uniform (the
    // ANN-adversarial case, where the dial honestly reports IVF cannot
    // prune); this lane builds a corpus that CAN be pruned (64 fixed
    // cluster directions + seeded per-id noise, fully deterministic)
    // and shows the same dial picking a small nprobe with a large
    // candidate/cost win while holding the floor.
    if (args.headOption.contains("dialsynth")) {
      val target = args.drop(1).headOption.map(_.toDouble).getOrElse(0.95)
      val nlist = args.drop(2).headOption.map(_.toInt).getOrElse(64)
      val nSynth = args.drop(3).headOption.map(_.toInt).getOrElse(200000)
      val dim = 32
      val nClusters = 64
      val centers = (0 until nClusters).map { c =>
        val r = new scala.util.Random(9000L + c)
        val a = Array.fill(dim)(r.nextGaussian())
        val norm = math.sqrt(a.map(x => x * x).sum)
        a.map(_ / norm)
      }
      import spark.implicits._
      val bcCenters = spark.sparkContext.broadcast(centers)
      val synth = spark.range(0, nSynth.toLong)
        .repartition(spark.sparkContext.defaultParallelism)
        .map { id =>
          val r = new scala.util.Random(id)
          val base = bcCenters.value((id % nClusters).toInt)
          val noisy = base.map(_ + r.nextGaussian() * 0.25)
          val norm = math.sqrt(noisy.map(x => x * x).sum)
          (id, noisy.map(_ / norm).toSeq)
        }.toDF("vec_id", "e")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      synth.count()
      dialLane(spark, synth, target, nlist)
      spark.stop()
      return
    }

    val e = transform(col("embedding"), (x: Column) => x.cast("double"))
    val data = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), e.as("e")).cache()
    val n = data.count()

    // Dial mode (`runMain graft.SweepIvf <sfDir> dial [target] [nlist]`):
    // validates Ivf.nprobeDial end-to-end at a real dial — calibrate on
    // the hash-ordered sample, then measure recall@5 of the CHOSEN
    // nprobe on an independent full query set against brute force, plus
    // the cost flank (candidates/query and wall time at nprobe-1 /
    // chosen / nlist) so the PERF row shows what the floor bought and
    // what the next probe would cost.
    if (args.drop(1).headOption.contains("dial")) {
      val target = args.drop(2).headOption.map(_.toDouble).getOrElse(0.95)
      val nlist = args.drop(3).headOption.map(_.toInt).getOrElse(32)
      dialLane(spark, data, target, nlist)
      spark.stop()
      return
    }

    // Big-nlist mode (`runMain graft.SweepIvf <sfDir> <nlist>`): times a
    // corpus-scale centroid dial end-to-end — sampled coarse-descent
    // training + full-corpus overlapping assignment — through BOTH
    // centroid carriers, proving the broadcast path (engaged automatically
    // at nlist ≥ Ivf.bcThreshold) and measuring what the literal carrier
    // costs at a dial the fixtures never reach. Skips the recall grids.
    args.drop(1).headOption.map(_.toInt).foreach { nlist =>
      import operators.Ivf
      def timed[T](what: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[bignlist] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      // Driver-heap probe (GC'd used MB) — the r10 flat-memory evidence
      // for the streaming-into-broadcast Lloyd refactor: training must
      // not stack per-round centroid Rows/broadcasts on the driver.
      def usedMB(): Long = {
        val rt = Runtime.getRuntime
        System.gc(); Thread.sleep(200); System.gc()
        (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      }
      println(s"[bignlist] n=$n vectors, nlist=$nlist, " +
        s"bcThreshold=${Ivf.bcThreshold}, coarseTrainThreshold=${Ivf.coarseTrainThreshold}")
      println(s"[bignlist] driver heap before train: ${usedMB()} MB")
      val cents = timed(s"train (sample=${25 * nlist}, coarse-step)") {
        val c = Ivf.centroids(data, nlist, iters = 4, trainSample = 25 * nlist)
        c.count(); c
      }
      println(s"[bignlist] driver heap after train (rounds=${Ivf.lastRounds}): ${usedMB()} MB")
      timed("assignMulti nassign=2 [broadcast carrier]") {
        Ivf.assignMulti(data, cents, nassign = 2)
          .write.format("noop").mode("overwrite").save()
      }
      val saved = Ivf.bcThreshold
      Ivf.bcThreshold = Int.MaxValue
      try timed("assignMulti nassign=2 [literal carrier]") {
        Ivf.assignMulti(data, cents, nassign = 2)
          .write.format("noop").mode("overwrite").save()
      } finally Ivf.bcThreshold = saved
      timed("assignMultiCoarse nassign=2 wCoarse=4 [broadcast carrier]") {
        Ivf.assignMultiCoarse(data, cents, nassign = 2)
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop()
      return
    }
    val queries = data.filter(col("vec_id") < 50)
    val k = 5

    // Brute-force ground truth: every query scored against every vector.
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("vec_id").asc)
    val brute = queries.select(col("vec_id").as("qid"), col("e").as("qe"))
      .crossJoin(data)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("c", round(graft.functions.CosineSimilarity(col("qe"), col("e")), 5))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
    val bruteSet = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    println(s"IVF sweep: n=$n vectors, ${bruteSet.size / k} queries, recall@$k")
    println("| nlist | rounds | nprobe | recall@5 | mean candidates/query |")
    println("|---|---|---|---|---|")
    for (nlist <- Seq(8, 16, 32)) {
      // ONE index per nlist: recall and cost must describe the SAME
      // trained quantiser, and retraining per grid point doubles the
      // sweep's dominant cost (centroids = iters × crossJoin passes)
      val cents = operators.Ivf.centroids(data, nlist)
      val rounds = operators.Ivf.lastRounds
      val indexed = operators.Ivf.assign(data, cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val index = Some((cents, indexed))
      for (nprobe <- Seq(1, 2, 4, 8) if nprobe <= nlist) {
        val ivf = operators.Ivf.topK(queries, data, k, nlist, nprobe, index = index)
          .select(col("qid"), col("vec_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (bruteSet & ivf).size.toDouble / bruteSet.size
        val cand = operators.Ivf.probeStats(queries, data, nlist, nprobe, index = index)
          .agg(avg(col("n_candidates"))).head.getDouble(0)
        println(f"| $nlist | $rounds | $nprobe | $recall%.3f | ${cand}%.0f |")
      }
      indexed.unpersist(false)
    }

    println(s"\nLSH sweep: n=$n vectors, ${bruteSet.size / k} queries, recall@$k")
    println("| tables | planes | nprobe | recall@5 | mean candidates/query |")
    println("|---|---|---|---|---|")
    for ((tables, planes, nprobe) <- Seq(
        (4, 5, 0), (8, 5, 0), (16, 5, 0), (32, 5, 0), (16, 7, 0),
        // multi-probe: same data-side index as the same-table-count row;
        // the query side probes the nprobe nearest-margin bit flips per
        // table. 6-plane rows halve bucket occupancy, trading base recall
        // for cheaper probes.
        (16, 5, 1), (16, 5, 2), (16, 5, 3), (16, 7, 2),
        (8, 5, 2), (8, 5, 3), (16, 6, 1), (16, 6, 2), (16, 6, 3))) {
      val ann = operators.Ann.lshTopK(queries, data, k, tables, planes,
          nprobe = nprobe)
        .select(col("qid"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (bruteSet & ann).size.toDouble / bruteSet.size
      val cand = operators.Ann.candidateStats(queries, data, tables, planes,
          nprobe = nprobe)
        .agg(avg(col("n_candidates"))).head.getDouble(0)
      println(f"| $tables | $planes | $nprobe | $recall%.3f | ${cand}%.0f |")
    }

    println(s"\nPQ sweep: n=$n vectors, ${bruteSet.size / k} queries, recall@$k" +
      " (full ADC scan — PQ is the compression layer, not a pruner)")
    println("| m | ksub | bytes/vec vs 512 | recall@5 |")
    println("|---|---|---|---|")
    val unit = operators.Pq.unitNormalized(data).cache()
    val unitQueries = unit.filter(col("vec_id") < 50)
    for ((m, ksub) <- Seq((8, 16), (8, 64), (16, 16), (16, 256))) {
      val cb = operators.Pq.train(unit, m, ksub)
      val pq = operators.Pq.topK(unitQueries, operators.Pq.encode(unit, cb), cb, k)
        .select(col("qid"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (bruteSet & pq).size.toDouble / bruteSet.size
      val bytes = m * (if (ksub <= 256) 1 else 2)
      println(f"| $m | $ksub | $bytes | $recall%.3f |")
    }
    spark.stop()
  }

  /** The dial validation lane shared by the fixture-corpus `dial` mode
    * and the clustered `dialsynth` mode: train one index, run
    * Ivf.nprobeDial, then measure recall@5 of the chosen nprobe on an
    * independent query set against Ann.bruteTopK, with the cost flank
    * (candidates/query, wall time) at nprobe-1 / chosen / +1 / nlist.
    */
  private def dialLane(spark: org.apache.spark.sql.SparkSession,
                       data: DataFrame, target: Double, nlist: Int): Unit = {
    import operators.Ivf
    val n = data.count()
    val k = 5
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (index, tTrain) = timed {
      val c = Ivf.centroids(data, nlist, iters = 4)
      val a = Ivf.assign(data, c).cache()
      a.count()
      (c, a)
    }
    val (d, tDial) = timed {
      Ivf.nprobeDial(data, k, target, nlist, sampleQueries = 128,
        index = Some(index))
    }
    println(f"[dial] n=$n nlist=$nlist target=$target: chose nprobe=${d.nprobe} " +
      f"(sample recall ${d.recallAtNprobe}%.4f over ${d.samplePairs} pairs); " +
      f"train ${tTrain}%.1f s, calibration ${tDial}%.1f s")
    println("[dial] curve head: " +
      d.curve.take(math.min(8, d.curve.size)).map(r => f"$r%.4f").mkString(" "))
    // independent validation queries: NOT the calibration sample (the
    // dial samples the salted hash-order head; take plain low ids
    // instead — overlap possible but not selected-for)
    val queries = data.filter(col("vec_id") < 50)
    val bruteSet = operators.Ann.bruteTopK(queries, data, k)
      .select(col("qid"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(bruteSet.nonEmpty,
      "validation query set empty (no vec_id < 50 in this corpus) — " +
        "the recall table would read NaN; point the dial at a corpus " +
        "with low-id vectors or adjust the query filter")
    println("| nprobe | recall@5 | mean candidates/query | topk sec |")
    println("|---|---|---|---|")
    val flank = Seq(math.max(1, d.nprobe - 1), d.nprobe,
      math.min(nlist, d.nprobe + 1), nlist).distinct.sorted
    for (np <- flank) {
      val (got, tq) = timed {
        Ivf.topK(queries, data, k, nlist, np, index = Some(index))
          .select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recall = (bruteSet & got).size.toDouble / bruteSet.size
      val cand = Ivf.probeStats(queries, data, nlist, np, index = Some(index))
        .agg(avg(col("n_candidates"))).collect().head.getDouble(0)
      val mark = if (np == d.nprobe) " <- dialed" else ""
      println(f"| $np | $recall%.4f | ${cand}%.0f | ${tq}%.1f |$mark")
    }
  }
}
