package graft

import graft.operators.{ConnectedComponents, EmbedDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup-shaped embedding dedup vs the exact all-pairs baseline
  * (SURVEY.md §7.5: fixture-recall + exactness bounds, not oracle
  * hashes — the operator is approximate by blocking, never by scoring).
  */
class EmbedDedupSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def exactPairs: Set[(Long, Long)] =
    SparkEntry.queries("dedup_embed")(spark, sf)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def cellPairs: Set[(Long, Long)] =
    SparkEntry.queries("dedup_embed_cells")(spark, sf)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("within-cell pairs have exact precision and usable recall vs all-pairs") {
    val exact = exactPairs
    val cells = cellPairs
    assert(exact.nonEmpty, "fixture has no above-threshold pairs — vacuous test")
    // Precision is structural: candidates are scored with the same
    // full-precision cosine the baseline uses, so every emitted pair must
    // be a true pair.
    assert((cells -- exact).isEmpty, s"false positives: ${cells -- exact}")
    // Recall: only cross-cell true pairs may be lost. The fixtures are
    // adversarial for blocking (uniform vectors, true pairs at the 0.45
    // threshold boundary ≈ 63° apart), so this floor is the worst case —
    // clustered real corpora, where dup pairs are tight, lose far less.
    val recall = cells.size.toDouble / exact.size
    info(s"cell-blocked recall: ${cells.size}/${exact.size} = $recall")
    assert(recall >= 0.5, s"recall $recall below floor: cells=$cells exact=$exact")
  }

  test("the recovery dial (bigger cells + more assigns) strictly buys recall") {
    // The SweepEmbedDedup finding pinned as a gate (PERF.md round-12
    // addendum): recall ∝≈ nassign² · cellshare, so the boundary-regime
    // recovery dial (nlist/4, nassign=4) must beat the default screen
    // dial (autoNlist, nassign=2) — a dial regression (e.g. an
    // assignment change that stops honoring nassign) shows here as an
    // ordering flip, not a silent recall cliff at 100x.
    import org.apache.spark.sql.functions._
    val e = transform(col("embedding"),
      (x: org.apache.spark.sql.Column) => x.cast("double"))
    val n = graft.Tables(spark, sf, "embeddings").select(col("vec_id"), e.as("e"))
    val auto = graft.operators.EmbedDedup.autoNlist(n.count())
    def recallAt(nlist: Int, nassign: Int): Double = {
      val got = graft.operators.EmbedDedup
        .cellPairs(n, threshold = 0.45, nlist = nlist, nassign = nassign)
        .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = exactPairs
      assert((got -- exact).isEmpty, s"false positives at ($nlist, $nassign)")
      got.size.toDouble / exact.size
    }
    val screen = recallAt(auto, 2)
    val recovery = recallAt(math.max(auto / 4, 1), 4)
    info(f"screen dial ($auto, 2): $screen%.3f; recovery (${auto / 4}, 4): $recovery%.3f")
    assert(recovery > screen,
      f"recovery dial must buy recall: $recovery%.3f <= $screen%.3f")
    assert(recovery >= 0.8,
      f"recovery-dial fixture floor: $recovery%.3f < 0.8")
  }

  test("LSH pairs: exact precision and boundary-tight recall vs all-pairs") {
    // The round-13 verdict path: at θ=0.45 (true pairs AT the threshold,
    // ~63° apart — the regime the round-12 sweep proved canopy blocking
    // tops out near 0.6 recall) hyperplane collision is distance-
    // calibrated, so the default dial (16 tables × 6 planes, nprobe=2)
    // must hold a HIGH floor where cells hold a low one. Precision is
    // structural (candidates scored with the full-precision cosine).
    val exact = exactPairs
    assert(exact.nonEmpty, "fixture has no above-threshold pairs — vacuous test")
    val lsh = SparkEntry.queries("dedup_embed_lsh")(spark, sf)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((lsh -- exact).isEmpty, s"false positives: ${lsh -- exact}")
    val recall = lsh.size.toDouble / exact.size
    info(s"LSH recall at theta=0.45: ${lsh.size}/${exact.size} = $recall")
    assert(recall >= 0.9,
      s"boundary-tight LSH recall $recall below floor 0.9 — the dial this " +
        "path exists for")
  }

  test("cross-relation LSH (decontamination): exact precision, recall floor vs all-pairs cross") {
    // text_decontaminate_embed's blocking: eval = vec_id < 50 (broadcast
    // index), corpus = the rest (one-sided multi-probe). Truth = the
    // quadratic eval × corpus cosine join — small by construction (the
    // eval side is 50 rows), so the spec affords the exact cross form.
    import org.apache.spark.sql.functions._
    val emb = graft.queries.ScaleOps.normalized(spark, sf)
      .select(col("vec_id"), col("e"), col("norm"))
    val eval = emb.filter(col("vec_id") < 50)
    val corpus = emb.filter(col("vec_id") >= 50)
    val brute = eval.alias("a").crossJoin(corpus.alias("b"))
      .withColumn("c", round(
        aggregate(zip_with(col("a.e"), col("b.e"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) / (col("a.norm") * col("b.norm")), 6))
      .filter(col("c") >= 0.45)
      .select(col("b.vec_id").as("corpus_id"), col("a.vec_id").as("eval_id"),
        col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(brute.nonEmpty, "no cross pairs at theta=0.45 — vacuous fixture")
    val got = graft.operators.EmbedDedup
      .lshPairsAcross(eval.drop("norm"), corpus.drop("norm"), threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision is structural (exact cosine verify) and SCORES must
    // agree with the brute form cell-for-cell on the shared pairs
    assert((got.keySet -- brute.keySet).isEmpty,
      s"false positives: ${got.keySet -- brute.keySet}")
    got.foreach { case (k, c) => assert(brute(k) === c, s"score drift at $k") }
    val recall = got.size.toDouble / brute.size
    info(s"cross-LSH recall at theta=0.45: ${got.size}/${brute.size} = $recall")
    assert(recall >= 0.9,
      s"one-sided cross-LSH recall $recall below the 0.9 floor")
    // the registered query's flags line up with the pair set
    val flagged = SparkEntry.queries("text_decontaminate_embed")(spark, sf)
      .filter(col("flagged")).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(flagged === got.keySet.map(_._1))
  }

  test("cross-relation LSH finds every PLANTED contamination (paraphrase regime)") {
    // The regime the operator exists for: eval items that are near-copies
    // of corpus docs (cosine ≈ 0.99 — paraphrased leakage), not the
    // boundary-θ adversarial pairs. 20 planted eval vectors = corpus
    // vectors with a small deterministic perturbation; every one must be
    // flagged at θ=0.8 through the one-sided blocking.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val corpus = graft.queries.ScaleOps.normalized(spark, sf)
      .select(col("vec_id"), col("e")).filter(col("vec_id") >= 50)
    val base = corpus.orderBy(col("vec_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val eval = base.zipWithIndex.map { case ((vid, e), i) =>
      (i.toLong, e.zipWithIndex.map { case (x, j) =>
        x + (if (j == i % e.length) 0.02 else 0.0) }.toSeq, vid)
    }.toSeq.toDF("vec_id", "e", "src")
    val got = graft.operators.EmbedDedup
      .lshPairsAcross(eval.select(col("vec_id"), col("e")), corpus,
        threshold = 0.8)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet // (eval, corpus)
    val expected = base.zipWithIndex.map { case ((vid, _), i) => (i.toLong, vid) }.toSet
    assert((expected -- got).isEmpty,
      s"planted contamination missed: ${expected -- got}")
  }

  test("lshDial computes a dial that meets the requested recall floor") {
    // The round-14 verdict ask: recall is a STATED floor, not a decayed
    // default. The model (per-plane p = 1−acos(θ)/π, per-table
    // p^b + κ·b·p^(b−1)(1−p) probe boost, 1−(1−·)^L over tables) is
    // calibrated conservative at both sweep anchors, so the computed
    // dial must deliver ≥ the floor on the adversarial fixture too.
    val exact = exactPairs
    assert(exact.nonEmpty, "fixture has no above-threshold pairs — vacuous test")
    import org.apache.spark.sql.functions._
    val ev = transform(col("embedding"),
      (x: org.apache.spark.sql.Column) => x.cast("double"))
    val n = graft.Tables(spark, sf, "embeddings").select(col("vec_id"), ev.as("e"))
    val rows = n.count()
    val (planes, tables, nprobe) = EmbedDedup.lshDial(rows, 0.45, 0.9)
    val predicted = EmbedDedup.lshPredictedRecall(0.45, planes, tables)
    assert(predicted >= 0.9,
      f"dial (planes=$planes tables=$tables) predicts $predicted%.3f < floor")
    val got = EmbedDedup.lshPairs(n, 0.45, tables = tables,
      planesPerTable = planes, nprobe = nprobe)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((got -- exact).isEmpty, s"false positives: ${got -- exact}")
    val recall = got.size.toDouble / exact.size
    info(f"dial (planes=$planes, tables=$tables, nprobe=$nprobe): " +
      f"predicted=$predicted%.3f measured=$recall%.3f")
    assert(recall >= 0.9,
      f"computed dial under-delivered: $recall%.3f < 0.9 floor")
  }

  test("lshDial model sanity: monotone in tables, anchored to the sweep fits") {
    // The two SweepEmbedDedup anchors the κ calibration was fit
    // against (PERF.md round-13, θ=0.45): the model must stay BELOW
    // the measured recalls (conservative) and within 10 points of
    // them (useful). Plus basic shape: more tables ⇒ more recall;
    // more planes ⇒ less per-table recall; the dial errors when the
    // floor is unreachable within maxTables.
    val m20k = EmbedDedup.lshPredictedRecall(0.45, 7, 16)
    val m200k = EmbedDedup.lshPredictedRecall(0.45, 10, 16)
    assert(m20k <= 0.99 && m20k >= 0.89, f"20k anchor drifted: $m20k%.3f")
    assert(m200k <= 0.73 && m200k >= 0.63, f"200k anchor drifted: $m200k%.3f")
    assert(EmbedDedup.lshPredictedRecall(0.45, 10, 32) > m200k)
    assert(EmbedDedup.lshPredictedRecall(0.45, 12, 16) < m200k)
    intercept[IllegalArgumentException] {
      EmbedDedup.lshDial(100000000L, 0.45, 0.999, maxTables = 8)
    }
  }

  test("LSH pair scores equal the all-pairs baseline's on the shared pairs") {
    // Interchangeability downstream needs equal COSINES, not just equal
    // pair ids: both paths round the same dot/(n1·n2) to 6 — a drift
    // here (e.g. a re-fused norm) would make cluster thresholds differ
    // between the baseline and the scale path.
    val base = SparkEntry.queries("dedup_embed")(spark, sf)
      .select("v1", "v2", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("dedup_embed_lsh")(spark, sf)
      .select("v1", "v2", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(lsh.nonEmpty)
    lsh.foreach { case (k, c) =>
      assert(base.get(k).contains(c), s"score drift on $k: lsh=$c base=${base.get(k)}")
    }
  }

  test("oversized cells are dropped whole and counted, never truncated") {
    import spark.implicits._
    // 40 near-identical vectors in one hot cell + two small cells, cap=10:
    // the hot cell's pairs must vanish ENTIRELY (not shrink), while the
    // small cells' pairs survive untouched. The assignment is constructed
    // directly (cellPairsAssigned seam) so the cap semantics are tested
    // without depending on Lloyd's cell geometry for a degenerate input.
    val hot = (0L until 40L).map(i => (i, Array(1.0, 0.0, 1e-9 * i), 0L))
    val cold = Seq(
      (100L, Array(-1.0, 0.1, 0.0), 1L), (101L, Array(-1.0, 0.11, 0.0), 1L),
      (102L, Array(0.0, -1.0, 0.0), 2L), (103L, Array(0.01, -1.0, 0.0), 2L))
    val assigned = (hot ++ cold).toDF("vec_id", "e", "cell")
    val uncapped = EmbedDedup.cellPairsAssigned(assigned, threshold = 0.9,
      maxCellSize = 100000)
    val capped = EmbedDedup.cellPairsAssigned(assigned, threshold = 0.9,
      maxCellSize = 10)
    val hotIds = hot.map(_._1).toSet
    assert(uncapped.filter(col("v1").isin(hotIds.toSeq: _*)).count() > 0)
    assert(capped.filter(col("v1").isin(hotIds.toSeq: _*)).count() == 0,
      "hot-cell pairs must be dropped whole by the cap")
    // cold pairs survive the cap untouched
    val coldPairs = capped.select("v1", "v2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(coldPairs === Set((100L, 101L), (102L, 103L)))
  }

  test("clusters equal connected components over the operator's own pair graph") {
    // build the expected labels from the CELL pair graph (the operator's
    // contract is CC over ITS pairs — recall loss lives in the pairs,
    // not the clustering)
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          (x: org.apache.spark.sql.Column) => x.cast("double")).as("e"))
    val edges = EmbedDedup.cellPairs(vecs, threshold = 0.45)
      .select(col("v1").as("src"), col("v2").as("dst"))
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cluster_id", "is_canonical").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val expected = labels(
      ConnectedComponents.clusterLabels(ConnectedComponents.componentsStar(edges)))
    val got = labels(EmbedDedup.clusters(vecs, threshold = 0.45))
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
