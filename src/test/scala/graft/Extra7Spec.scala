package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ConnectedComponents, MinHash}
import graft.queries.Extra7

/** pipeline_end2end_full invariants beyond the oracle hash (SURVEY.md
  * §7.5): the MinHash-LSH near-dup variant must make the SAME drop
  * decisions on fixtures (the dedup_minhash_cluster precedent — at
  * unbounded scale the LSH candidate generator replaces the shingle
  * self-join, and the swap must be behavior-preserving where recall is
  * 1), and the composed pipeline must be partitioning-invariant.
  */
class Extra7Spec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dropSet(pairs: org.apache.spark.sql.DataFrame): Set[Long] =
    ConnectedComponents.components(pairs)
      .filter(col("v") =!= col("c"))
      .select(col("v")).collect().map(_.getLong(0)).toSet

  test("near-dup stage: MinHash-LSH variant drops the same docs on fixtures") {
    // The swap the scaladoc promises: stage 3's exact shingle-join pair
    // graph vs MinHash-LSH candidates + exact verification, both over
    // the SAME canon survivor set, both through the same CC + min-id
    // canonical rule. On the fixtures LSH recall is 1 (64 hashes × 16
    // bands at jac ≥ 0.6), so the drop sets must be EQUAL — a future
    // signature/banding change that loses fixture pairs fails here, not
    // silently at 100 TB.
    val canon = Extra7.canonDocs(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sh = Extra7.shinglesOf(canon)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exact =
        try dropSet(Extra7.jaccardPairs(sh, 0.6))
        finally sh.unpersist(false)
      // the scale path hashes shingles to 64-bit keys (ScaleOps rule)
      val hashed = Extra7.shinglesOf(canon)
        .select(col("doc_id"), xxhash64(col("s")).as("s")).distinct()
      val mh = dropSet(
        MinHash.nearDuplicatesFromText(canon, hashed, threshold = 0.6)
          .select(col("d1").as("src"), col("d2").as("dst")))
      assert(exact.nonEmpty, "fixture has no near-dup drops — vacuous test")
      assert(mh === exact,
        s"MinHash variant diverged: onlyExact=${exact -- mh} onlyMh=${mh -- exact}")
    } finally { canon.unpersist(false); () }
  }

  test("pipeline_end2end_scale manifest equals the exact form's on fixtures") {
    // The round-14 registered swap: stage 3 exact shingle self-join →
    // MinHash-LSH candidates + exact verification, stages 1-2/4-7
    // shared verbatim (pipelineTail). On fixtures LSH recall is 1, so
    // the two registered queries must produce the IDENTICAL 16-row
    // manifest — every keep/drop decision in all seven stages pinned
    // equal, not just the stage-3 pair set (the dropSet test above).
    val full = SparkEntry.queries("pipeline_end2end_full")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val scale = SparkEntry.queries("pipeline_end2end_scale")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(full.nonEmpty && scale === full)
  }

  test("sample_mix_dynamic reproduces the static 16-shard plan on fixtures") {
    // Fixture sources sit far below the level-2 threshold (16 ·
    // DynShardTokens tokens), so every source takes the ELSE branch —
    // the dynamic query must be the static sample_mix_plan EXACTLY
    // (same kept set, not just similar): the dial only ever changes
    // behavior for sources big enough to need it.
    val stat = SparkEntry.queries("sample_mix_plan")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val dyn = SparkEntry.queries("sample_mix_dynamic")(spark, sf)
      .drop("n_shards").collect().map(_.toSeq).toSeq
    assert(stat.nonEmpty && dyn === stat)
  }

  test("dynamic shards: a dominant source fans out to 256 and fills its budget") {
    import spark.implicits._
    // synthetic docTok through the seam: src_big crosses the level-2
    // threshold (1.2M tokens > 16·65536), src_small stays level 1
    val big = (0L until 4000L).map(i => (i, "src_big", 300L))
    val small = (100000L until 100200L).map(i => (i, "src_small", 100L))
    val docTok = (big ++ small).toDF("doc_id", "source", "ntok")
      .withColumn("m", org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("doc_id").cast("string")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rows = Extra7.mixPlanDynamic(docTok).collect()
        .map(r => r.getAs[String]("source") -> r).toMap
      assert(rows("src_big").getAs[Long]("n_shards") == 256L,
        "big source must get 256 shards")
      assert(rows("src_small").getAs[Long]("n_shards") == 16L,
        "small source must keep 16")
      // greedy budget-fill bound: each of the S shards overshoots its
      // slice by at most one doc, so |kept − target| < S · max(ntok)
      val target = rows("src_big").getAs[Double]("target_tokens")
      val kept = rows("src_big").getAs[Long]("kept_tokens")
      assert(math.abs(kept - target) < 256L * 300L,
        s"big-source fill missed its budget: kept=$kept target=$target")
      // the kept-decision is a pure function of (m, target/shards) —
      // partitioning must not move it
      val p = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val alt = Extra7.mixPlanDynamic(docTok).collect()
          .map(r => r.getAs[String]("source") -> r.getAs[Long]("kept_tokens")).toMap
        assert(alt("src_big") == kept)
      } finally spark.conf.set("spark.sql.shuffle.partitions", p)
    } finally { docTok.unpersist(false); () }
  }

  test("QualityScorer rejects carry columns colliding with its output contract") {
    // The _qs_ prefix guards the WORKING columns; the OUTPUT columns
    // (doc_id, x1..x3, y, p, keep) need the same guard — a carry named
    // one of them silently duplicates a column name and breaks any
    // downstream by-name select. Misuse must fail at construction.
    import spark.implicits._
    val docs = Seq((1L, "hello world text here")).toDF("doc_id", "text")
    val w = spark.range(1).select(
      lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"), lit(0.0).as("w3"))
    val e = intercept[IllegalArgumentException] {
      graft.operators.QualityScorer.score(docs, w, carry = Seq("keep"))
    }
    assert(e.getMessage.contains("keep"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.QualityScorer.features(docs, carry = Seq("x1"))
    }
    assert(e2.getMessage.contains("x1"))
    // legitimate carries still pass through untouched
    val ok = graft.operators.QualityScorer.features(docs, carry = Seq("text"))
    assert(ok.columns.count(_ == "text") == 1)
  }

  test("pipeline_end2end_full output is partitioning-invariant") {
    // The manifest checksums are order-independent sums and the fill
    // decision a pure function of (m, snapped target) — so the 16-row
    // output must not move when the input partitioning does. Guards the
    // classic composed-pipeline failure: a stage accidentally depending
    // on partition order (e.g. a truncating cap or a non-deterministic
    // tie-break) shows here as a checksum flip.
    val base = SparkEntry.queries("pipeline_end2end_full")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val p = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = SparkEntry.queries("pipeline_end2end_full")(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(base.nonEmpty && base === alt)
    } finally spark.conf.set("spark.sql.shuffle.partitions", p)
  }
}
