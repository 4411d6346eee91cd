package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplication-dial pricing for the pipeline's stage-3 forms (round-15
  * verdict #6): the driver fixture's 1.9× exact-vs-LSH gap at 100× is
  * duplication-LIMITED (PERF.md round-14 says so honestly), so this
  * sweep synthesizes a BOILERPLATE-HEAVY corpus and measures where the
  * exact shingle self-join's quadratic stage separates without bound —
  * plus the drop-set equality spot-check at each dial (the Extra7Spec
  * fixture-equality claim, re-proven on the adversarial corpus). A
  * local iteration aid like [[SweepSubstring]]; not the driver contract.
  *
  * Fixture (deterministic): every doc = `boiler` shared boilerplate
  * tokens + 48 body tokens. 20% of docs are TEMPLATE near-dups (50
  * templates, one body-token substitution keyed by replica → pairwise
  * shingle Jaccard ≈ 0.85 ≥ the 0.6 threshold: real dedup targets,
  * group size n/250 — safely under the LSH bucket cap); the rest have
  * globally unique bodies. The boilerplate is the adversary: each of
  * its shingles appears in EVERY doc, so the exact form's per-shingle
  * self-join materializes (boiler−2)·n²/2 pair rows that all verify
  * BELOW threshold (pure wasted quadratic work — boilerplate-only
  * overlap is jac ≈ 0.2–0.35 < 0.6), while the banded form's cost is
  * capped per bucket and its candidates stay near the true-pair mass.
  *
  * Usage: `sbt "runMain graft.SweepPipeline [n boiler]..."` — pairs of
  * dials; default `5000 0  5000 16  5000 48  10000 16`.
  */
object SweepPipeline {
  /** Canon-shaped synthetic corpus (doc_id, source, n_chars, text, ch)
    * — the [[graft.queries.Extra7.canonDocs]] output contract, fed
    * straight to stage 3 (the fixture has no exact dups by
    * construction; stages 1–2 are shared verbatim anyway).
    */
  def synthDocs(spark: SparkSession, n: Int, boiler: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val bp = (0 until boiler).map(j => s"bp$j").mkString(" ")
      val body =
        if (i % 5 == 0) {
          val t = (i / 5) % 50
          val r = i / 250
          val toks = Array.tabulate(48)(k => s"t${t}_$k")
          toks((r % 46).toInt + 1) = s"u$i"
          toks.mkString(" ")
        } else Array.tabulate(48)(k => s"x${i}_$k").mkString(" ")
      val text = if (bp.isEmpty) body else s"$bp $body"
      (i, "synth", text.length, text)
    }.toDF("doc_id", "source", "n_chars", "text")
      .withColumn("ch", md5(col("text")))
  }

  /** (doc_id drop set, seconds) under a stage-3 pair rule. */
  private def dropSet(canon: DataFrame,
                      pairs: DataFrame => DataFrame): (Set[Long], Double) = {
    val t0 = System.nanoTime()
    val labels = operators.ConnectedComponents.components(pairs(canon))
    val drop = labels.filter(col("v") =!= col("c"))
      .select(col("v")).collect().map(_.getLong(0)).toSet
    (drop, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    // numeric args are (n, boiler) pairs; flags (`debug`) ride alongside
    val nums = args.toSeq.filter(_.forall(_.isDigit)).map(_.toInt)
    val dials: Seq[(Int, Int)] =
      if (nums.nonEmpty) nums.grouped(2).map(p => (p(0), p(1))).toSeq
      else Seq((5000, 0), (5000, 16), (5000, 48), (10000, 16))
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    for ((n, boiler) <- dials) {
      val canon = synthDocs(spark, n, boiler).persist(StorageLevel.MEMORY_AND_DISK)
      canon.count()
      val sh = queries.Extra7.shinglesOf(canon)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nSh = sh.count()
      val hottest = sh.groupBy(col("s")).agg(count(lit(1)).as("d"))
        .agg(max(col("d"))).collect()(0).getLong(0)
      val (exactDrop, exactSec) = dropSet(canon,
        _ => queries.Extra7.jaccardPairs(sh, 0.6))
      val (scaleDrop, scaleSec) = dropSet(canon, c => {
        val hashed = sh.select(col("doc_id"), xxhash64(col("s")).as("s")).distinct()
        operators.MinHash.nearDuplicatesFromText(c, hashed, threshold = 0.6)
          .select(col("d1").as("src"), col("d2").as("dst"))
      })
      println(f"[sweep-pipeline] n=$n boiler=$boiler shingles=$nSh " +
        f"hottestShingleDocs=$hottest exactSec=$exactSec%.1f " +
        f"scaleSec=$scaleSec%.1f ratio=${exactSec / math.max(0.001, scaleSec)}%.2f " +
        f"drops=${exactDrop.size} dropSetsEqual=${exactDrop == scaleDrop}")
      if (args.contains("debug") && exactDrop != scaleDrop) {
        println(s"[sweep-pipeline]   exactOnly=${(exactDrop -- scaleDrop).toSeq.sorted.take(10)}")
        println(s"[sweep-pipeline]   scaleOnly=${(scaleDrop -- exactDrop).toSeq.sorted.take(10)}")
        def pairSet(df: DataFrame) = df.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val ep = pairSet(queries.Extra7.jaccardPairs(sh, 0.6))
        val hashed = sh.select(col("doc_id"), xxhash64(col("s")).as("s")).distinct()
        val sp = pairSet(operators.MinHash
          .nearDuplicatesFromText(canon, hashed, threshold = 0.6)
          .select(col("d1"), col("d2")))
        println(s"[sweep-pipeline]   pairs exact=${ep.size} scale=${sp.size} " +
          s"exactOnlyPairs=${(ep -- sp).take(5)} scaleOnlyPairs=${(sp -- ep).take(5)}")
        for ((d1, d2) <- (ep -- sp).take(3)) {
          def shingleSet(d: Long) = sh.filter(col("doc_id") === d)
            .select(col("s")).collect().map(_.getString(0)).toSet
          val (s1, s2) = (shingleSet(d1), shingleSet(d2))
          val jac = (s1 & s2).size.toDouble / (s1 | s2).size
          def sig(d: Long) = operators.MinHash
            .signaturesLocal(canon.filter(col("doc_id") === d))
            .collect()(0).getSeq[Long](1)
          val (g1, g2) = (sig(d1), sig(d2))
          val agree = g1.zip(g2).count(p => p._1 == p._2)
          val bandHits = g1.grouped(4).toSeq.zip(g2.grouped(4).toSeq)
            .count(p => p._1 == p._2)
          println(f"[sweep-pipeline]   missed ($d1,$d2) jac=$jac%.3f " +
            f"sigAgree=$agree/64 bandHits=$bandHits/16")
        }
      }
      sh.unpersist(false)
      canon.unpersist(false)
    }
    spark.stop()
  }
}
