package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end image-similarity decade: real rasters →
  * [[graft.operators.Multimodal.extractFeatures]] (ImageIO decode +
  * content feature) → [[graft.operators.Ann.lshTopK]] retrieval —
  * recall measured on the PLANTED near-dups (every 4th base image ships
  * a re-encoded exact-content dup at id+off and a one-pixel-nudged near
  * dup at id+2·off), so the ground truth is construction, not a
  * quadratic brute-force pass. This is the round-14 verdict-#7 lane:
  * the feature→ANN composition was unit-tested at 48 rasters only;
  * here it runs at 10³–10⁵ with the ANN dial scaled like production
  * ([[graft.operators.EmbedDedup.autoPlanes]] — planes grow with the
  * corpus so buckets stay bounded). Results recorded in PERF.md; the
  * 4800-dial recall floor is pinned in ScaleOpsSpec. Not part of the
  * driver contract; a local iteration aid like [[SweepPhash]].
  *
  * Usage: `sbt "runMain graft.SweepImageAnn [n1 n2 ...]"` (default
  * 4800 / 12000 / 48000 base images; rows = 1.5n after planting).
  */
object SweepImageAnn {
  /** (exactRecall, nudgeRecall, rows, queries) at dial n — the
    * measurement body, shared with the ScaleOpsSpec floor test.
    * Recall@k: a dup query hits if its planted source id is in its
    * top-k. Exact-content dups embed IDENTICALLY (the feature reads
    * the decoded raster, not the envelope), so their miss budget is
    * pure ranking crowd-out; nudged dups also pay feature drift.
    */
  def measure(spark: org.apache.spark.sql.SparkSession, n: Int, k: Int = 5)
      : (Double, Double, Long, Long) = {
    val off = operators.Multimodal.dupOffset(n)
    val media = operators.Multimodal.syntheticImagesWithDups(spark, n)
    val feats = operators.Multimodal
      .extractFeatures(media, dim = 32, operators.Multimodal.ImageIoCodec)
      .select(col("media_id").as("vec_id"),
        transform(col("embedding"), (x: Column) => x.cast("double")).as("e"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rows = feats.count()
    val planes = operators.EmbedDedup.autoPlanes(rows)
    val queries = feats.filter(col("vec_id") >= off)
    val top = operators.Ann.lshTopK(queries, feats, k = k,
        planesPerTable = planes, dim = 32, nprobe = 2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    top.count()
    // base = qid − off (exact re-encode) or qid − 2·off (nudge)
    val expected = queries.select(col("vec_id").as("qid"),
      when(col("vec_id") < 2 * off, col("vec_id") - off)
        .otherwise(col("vec_id") - 2 * off).as("base"),
      (col("vec_id") < 2 * off).as("is_exact"))
    val hits = top.join(expected, Seq("qid"))
      .filter(col("vec_id") === col("base"))
      .select(col("qid"), col("is_exact")).distinct()
      .groupBy(col("is_exact")).agg(count(lit(1)).as("h"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val nExact = queries.filter(col("vec_id") < 2 * off).count()
    val nNudge = queries.count() - nExact
    top.unpersist(false)
    feats.unpersist(false)
    (hits.getOrElse(true, 0L).toDouble / math.max(1L, nExact),
      hits.getOrElse(false, 0L).toDouble / math.max(1L, nNudge),
      rows, nExact + nNudge)
  }

  /** Round-15 dialed path (verdict #1): the 48k-raster decade above
    * cost 850.6 s at the fixed (autoPlanes, 16 tables) dial because the
    * crowded histogram space piles near-identical vectors into hot
    * buckets 9 planes can't split. The production prescription, now
    * code: (a) [[graft.operators.Ann.lshTopKGrouped]] collapses the
    * distance-0 mass into one representative per distinct vector (the
    * planted exact dups — a third of the dup rows — never reach the
    * candidate join), (b) [[graft.operators.Ann.lshTopKDial]] buys
    * planes ABOVE the bucket default (`targetBucket` 32 vs 250 —
    * buckets shrink 2× per plane) and pays the recall back with
    * computed tables at the nudge-dup cosine, (c) `maxBucketSize`
    * bounds whatever near-identical crowd remains, per table. Recall
    * floor stays ≥0.95 by construction of the dial; predicted recall
    * is printed next to measured so the one-sided κ calibration is a
    * number in PERF.md.
    */
  def measureDialed(spark: org.apache.spark.sql.SparkSession, n: Int,
                    k: Int = 5, targetRecall: Double = 0.95,
                    theta: Double = 0.98, targetBucket: Int = 32,
                    maxBucketSize: Int = 4000)
      : (Double, Double, Long, Long, (Int, Int, Int), Double) = {
    val off = operators.Multimodal.dupOffset(n)
    val media = operators.Multimodal.syntheticImagesWithDups(spark, n)
    val feats = operators.Multimodal
      .extractFeatures(media, dim = 32, operators.Multimodal.ImageIoCodec)
      .select(col("media_id").as("vec_id"),
        transform(col("embedding"), (x: Column) => x.cast("double")).as("e"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rows = feats.count()
    // the dial prices DISTINCT vectors — the collapse runs before the
    // index, so exact-dup mass must not inflate the plane count
    val distinct = feats.select(col("e")).distinct().count()
    val dial @ (planes, tables, nprobe) =
      operators.Ann.lshTopKDial(distinct, theta, targetRecall, targetBucket)
    val predicted = operators.Ann.lshTopKPredictedRecall(theta, planes, tables)
    val queries = feats.filter(col("vec_id") >= off)
    val top = operators.Ann.lshTopKGrouped(queries, feats, k = k,
        tables = tables, planesPerTable = planes, dim = 32, nprobe = nprobe,
        maxBucketSize = maxBucketSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    top.count()
    val expected = queries.select(col("vec_id").as("qid"),
      when(col("vec_id") < 2 * off, col("vec_id") - off)
        .otherwise(col("vec_id") - 2 * off).as("base"),
      (col("vec_id") < 2 * off).as("is_exact"))
    val hits = top.join(expected, Seq("qid"))
      .filter(col("vec_id") === col("base"))
      .select(col("qid"), col("is_exact")).distinct()
      .groupBy(col("is_exact")).agg(count(lit(1)).as("h"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val nExact = queries.filter(col("vec_id") < 2 * off).count()
    val nNudge = queries.count() - nExact
    top.unpersist(false)
    feats.unpersist(false)
    (hits.getOrElse(true, 0L).toDouble / math.max(1L, nExact),
      hits.getOrElse(false, 0L).toDouble / math.max(1L, nNudge),
      rows, distinct, dial, predicted)
  }

  def main(args: Array[String]): Unit = {
    val dialed = args.headOption.contains("dial")
    val rest = (if (dialed) args.drop(1) else args).toSeq.map(_.toInt)
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    if (dialed) {
      for (n <- if (rest.nonEmpty) rest else Seq(12000, 48000, 120000)) {
        val t0 = System.nanoTime()
        val (exactR, nudgeR, rows, distinct, (planes, tables, nprobe), pred) =
          measureDialed(spark, n)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[sweep-image-ann] dial n=$n rows=$rows distinct=$distinct " +
          f"planes=$planes tables=$tables nprobe=$nprobe predicted=$pred%.4f " +
          f"exactRecall=$exactR%.4f nudgeRecall=$nudgeR%.4f sec=$dt%.1f")
      }
    } else {
      for (n <- if (rest.nonEmpty) rest else Seq(4800, 12000, 48000)) {
        val t0 = System.nanoTime()
        val (exactR, nudgeR, rows, nq) = measure(spark, n)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[sweep-image-ann] n=$n rows=$rows queries=$nq " +
          f"planes=${operators.EmbedDedup.autoPlanes(rows)} " +
          f"exactRecall=$exactR%.4f nudgeRecall=$nudgeR%.4f sec=$dt%.1f")
      }
    }
    spark.stop()
  }
}
