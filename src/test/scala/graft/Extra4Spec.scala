package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Extra4

/** Crafted-input tests for the round-10 Extra4 operators. The DuckDB
  * oracle (144-query set) is the primary gate for these queries; this
  * spec pins the ALGORITHMIC properties crafted fixtures can show and
  * hash-comparison can't: the winnowing guarantee, tolerance as-of
  * exclusion semantics, Gopher rule attribution, boilerplate df
  * thresholding, and z-score math.
  */
class Extra4Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ---- winnowing -------------------------------------------------------

  private def fps(texts: Seq[String]): Map[String, Seq[String]] =
    texts.zipWithIndex.toDF("text", "doc_id")
      .filter(length(col("text")) >= Extra4.WinnowK + Extra4.WinnowW - 1)
      .select(col("doc_id"), Extra4.winnowFingerprints(col("text")).as("f"))
      .collect()
      .map(r => r.getInt(0).toString -> r.getSeq[String](1))
      .toMap

  test("winnowing guarantee: a shared substring of length >= k+w-1 yields a shared fingerprint") {
    // k=8, w=4 → guarantee threshold 11 chars. The two texts share a
    // 20-char span inside otherwise-different content.
    val shared = "zqxjvwpkyhgfdtrmnbcl"
    val m = fps(Seq(s"aaaaaaaaaaaa${shared}bbbbbbbbbbbb",
                    s"cccccccccccc${shared}dddddddddddd"))
    assert(m("0").toSet.intersect(m("1").toSet).nonEmpty,
      "documents sharing a 20-char substring must share a fingerprint")
  }

  test("winnowing density: fingerprints are a strict subset of gram hashes and deterministic") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val m1 = fps(Seq(text)); val m2 = fps(Seq(text))
    assert(m1("0") == m2("0"), "fingerprints must be deterministic")
    val nGrams = text.length - Extra4.WinnowK + 1
    assert(m1("0").nonEmpty && m1("0").size < nGrams,
      s"expected 0 < n_fp < $nGrams gram hashes, got ${m1("0").size}")
    assert(m1("0") == m1("0").sorted && m1("0").distinct == m1("0"),
      "fingerprint set must be sorted and distinct")
  }

  test("winnowing: disjoint-alphabet texts share no fingerprints") {
    val m = fps(Seq("abababababababababababab", "cdcdcdcdcdcdcdcdcdcdcdcd"))
    assert(m("0").toSet.intersect(m("1").toSet).isEmpty)
  }

  test("native winnow_fps is bit-identical to the declarative reference, incl. multi-byte text") {
    graft.functions.WinnowFingerprints.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa",                       // all-equal digests
      "héllo wörld — ünïcode ärgument païrs över täst", // 2-byte chars
      "日本語のテキストで窓最小化を検証する長い文章です",     // 3-byte chars
      "mixed ascii と 日本語 and móre 🙂🙃 emoji 🙂 text",  // supplementary
      (1 to 40).map(i => s"w$i").mkString(" "))
    val df = texts.zipWithIndex.toDF("text", "doc_id")
      .filter(length(col("text")) >= Extra4.WinnowK + Extra4.WinnowW - 1)
    val both = df.select(col("doc_id"),
        Extra4.winnowFingerprints(col("text")).as("ref"),
        graft.functions.WinnowFingerprints(
          col("text"), Extra4.WinnowK, Extra4.WinnowW).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.get(0)}: ref ${r.getSeq[String](1)} != native ${r.getSeq[String](2)}")
    }
  }

  test("native winnow_fps returns an empty set below one full window") {
    graft.functions.WinnowFingerprints.register(spark)
    val out = Seq("tiny", "exactlyten!").toDF("text")  // 4 and 11 chars; k+w-1 = 11
      .select(graft.functions.WinnowFingerprints(
        col("text"), Extra4.WinnowK, Extra4.WinnowW).as("f"))
      .collect().map(_.getSeq[String](0).size)
    assert(out.toSeq == Seq(0, 1), s"expected sizes 0 and 1, got ${out.toSeq}")
  }

  test("dedup_winnow machinery: a long shared span yields a candidate pair") {
    // dedup_winnow dials: k=20, w=8, minShared=2. A shared span of
    // length >= 2·(k + w − 1) = 54 chars guarantees >= 2 shared
    // fingerprints by the winnowing guarantee applied to its two
    // disjoint halves — crafted docs sharing a 59-char span MUST pair.
    graft.functions.WinnowFingerprints.register(spark)
    val shared = "zq xw vj pk yh gf dt rm nb cl zq xw vj pk yh gf dt rm nb cl"
    assert(shared.length >= 54)
    val docs = Seq(
      (0L, s"prefix0 aaaa $shared zzzz suffix0"),
      (1L, s"prefix1 bbbb $shared yyyy suffix1"),
      (2L, "totally unrelated content with no overlap at all here"))
      .toDF("doc_id", "text")
    val fps = docs
      .filter(length(col("text")) >= 27)
      .select(col("doc_id"),
        explode(graft.functions.WinnowFingerprints(col("text"), 20, 8)).as("fp"))
    val pairs = graft.functions.CappedLongCollect
      .groupPairs(fps, Seq(col("fp")), col("doc_id"), 500)
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 2)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)),
      s"docs sharing a 59-char span must be winnow candidates, got $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"the unrelated doc must not pair: $pairs")
  }

  // ---- tolerance as-of -------------------------------------------------

  test("asofTolerance picks the latest in-window match and drops out-of-tolerance lefts") {
    val left = Seq(
      (1L, 10L, "2024-01-01 12:00:00"),  // two candidates in window
      (2L, 10L, "2024-01-01 23:00:00"),  // nearest candidate 7h old → no match
      (3L, 20L, "2024-01-01 12:00:00")   // key with no right rows at all
    ).toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq(
      (100L, 10L, "2024-01-01 10:00:00"),
      (101L, 10L, "2024-01-01 11:30:00"),
      (102L, 30L, "2024-01-01 12:00:00")
    ).toDF("rid", "rk", "rt").withColumn("rt", col("rt").cast("timestamp"))
    val out = Extra4.asofTolerance(left, right,
        leftId = col("id"), leftKey = col("k"), rightKey = col("rk"),
        leftTime = col("t"), rightTime = col("rt"),
        rightTieBreak = col("rid"), tolerance = "6 HOURS")
      .select(col("id"), col("rid")).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 101L),
      s"expected only left 1 matched to the later candidate 101, got $out")
  }

  test("asofTolerance includes a match exactly tolerance away (pandas inclusive bound)") {
    val left = Seq((1L, 10L, "2024-01-01 18:00:00"))
      .toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((100L, 10L, "2024-01-01 12:00:00"))  // exactly 6h older
      .toDF("rid", "rk", "rt").withColumn("rt", col("rt").cast("timestamp"))
    val out = Extra4.asofTolerance(left, right,
        leftId = col("id"), leftKey = col("k"), rightKey = col("rk"),
        leftTime = col("t"), rightTime = col("rt"),
        rightTieBreak = col("rid"), tolerance = "6 HOURS")
      .select(col("rid")).as[Long].collect().toSeq
    assert(out == Seq(100L),
      s"abs(dt) == tolerance must match (merge_asof semantics), got $out")
  }

  test("asofTolerance breaks exact-time ties by greatest tiebreak") {
    val left = Seq((1L, 10L, "2024-01-01 12:00:00"))
      .toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq(
      (100L, 10L, "2024-01-01 11:00:00"),
      (200L, 10L, "2024-01-01 11:00:00")
    ).toDF("rid", "rk", "rt").withColumn("rt", col("rt").cast("timestamp"))
    val out = Extra4.asofTolerance(left, right,
        leftId = col("id"), leftKey = col("k"), rightKey = col("rk"),
        leftTime = col("t"), rightTime = col("rt"),
        rightTieBreak = col("rid"), tolerance = "6 HOURS")
      .select(col("rid")).as[Long].collect().toSeq
    assert(out == Seq(200L))
  }

  // ---- Gopher quality gate ---------------------------------------------

  test("gopherQuality attributes each failing rule independently") {
    val longDoc = (Seq.fill(30)("the table") ++ Seq.fill(20)("a value"))
      .mkString(" ")                               // 100 words, passes all
    val shortDoc = "the a short doc"               // fails ok_len only
    val longWords = Seq.fill(60)("extraordinarily the a").mkString(" ")
      // mean word length (17+3+1)/3 = 7 → passes; craft a failing one:
    val thinWords = (Seq.fill(60)("a b") ++ Seq("the")).mkString(" ")
      // 121 words, mean len ~1 → fails ok_word_len; has the+a → ok_stop
    val noStops = Seq.fill(80)("table value").mkString(" ")
      // 160 words, no stopwords → fails ok_stop only
    val rows = Extra4.gopherQuality(
        Seq((0L, longDoc), (1L, shortDoc), (2L, thinWords), (3L, noStops),
            (4L, longWords))
          .toDF("doc_id", "text"))
      .select(col("doc_id"), col("ok_len"), col("ok_word_len"),
        col("ok_alpha"), col("ok_stop"), col("keep"))
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows(0L) == (0L, true, true, true, true, true))
    assert(!rows(1L)._2 && rows(1L)._5 && !rows(1L)._6,
      s"short doc must fail ok_len only (stop rule still passes): ${rows(1L)}")
    assert(rows(2L)._2 && !rows(2L)._3 && rows(2L)._5 && !rows(2L)._6,
      s"thin-words doc must fail ok_word_len only: ${rows(2L)}")
    assert(rows(3L)._2 && rows(3L)._3 && !rows(3L)._5 && !rows(3L)._6,
      s"stopword-free doc must fail ok_stop only: ${rows(3L)}")
    assert(rows(4L)._6, s"long-words doc expected to pass: ${rows(4L)}")
  }

  // ---- boilerplate -----------------------------------------------------

  test("boilerplateSignals flags cross-document duplicated grams, not intra-doc repeats") {
    val shared = "alpha beta gamma delta epsilon"     // one shared 5-gram
    val d0 = s"$shared unique0 tokens here now"
    val d1 = s"$shared other1 words go here"
    val d2 = "совершенно different содержание without overlap at all"
    // intra-doc repetition only — the same 5-gram twice in ONE doc must
    // NOT count as boilerplate (df counts DISTINCT docs):
    val d3 = "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5"
    val out = Extra4.boilerplateSignals(
        Seq((0L, d0), (1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"))
      .select(col("doc_id"), col("n_boiler"), col("flagged"))
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == 1 && out(1L)._2 == 1,
      s"the shared 5-gram must count once per sharing doc: $out")
    assert(out(2L)._2 == 0 && !out(2L)._3)
    assert(out(3L)._2 == 0,
      s"intra-doc repetition must not be boilerplate: ${out(3L)}")
  }

  // ---- bloom membership screen ------------------------------------------

  test("dedup_bloom screen has zero false negatives and partitioning-invariant flags") {
    // 200 seen docs; incoming = 100 true duplicates (same text) + 100
    // fresh docs. Every true duplicate MUST be flagged (the bloom
    // guarantee); false positives are allowed but must be rare and
    // correctly labeled in the is_fp cell.
    val docs = ((0L until 200L).map(i => (i, s"seen document body number $i")) ++
        (200L until 300L).map(i => (i, s"seen document body number ${i - 200}")) ++
        (300L until 400L).map(i => (i, s"fresh unseen content ${i * 31}")))
      .toDF("doc_id", "text")
    val out = graft.operators.BloomDedup
      .screenReport(spark, docs, splitId = 200L, fpp = 0.01)
      .select(col("doc_id"), col("maybe_seen"), col("exact_dup"), col("is_fp"))
      .as[(Long, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 200)
    (200L until 300L).foreach { i =>
      assert(out(i)._2 && out(i)._3 && !out(i)._4,
        s"true duplicate $i must be flagged and not a false positive: ${out(i)}")
    }
    val fps = (300L until 400L).count(i => out(i)._2)
    assert((300L until 400L).forall(i => !out(i)._3), "fresh docs are not exact dups")
    assert((300L until 400L).forall(i => out(i)._2 == out(i)._4),
      "for fresh docs, maybe_seen must equal is_fp")
    assert(fps <= 10, s"false-positive count $fps exceeds 10% on a 1% fpp filter")
    // partitioning invariance: same flags from a different layout
    val out2 = graft.operators.BloomDedup
      .screenReport(spark, docs.repartition(13, col("text")), splitId = 200L, fpp = 0.01)
      .select(col("doc_id"), col("maybe_seen"))
      .as[(Long, Boolean)].collect().toMap
    assert((200L until 400L).forall(i => out2(i) == out(i)._2),
      "maybe_seen must not depend on partitioning")
  }

  test("sharded bloom screen: k=1 bit-identical, k>1 keeps the guarantee cells") {
    // The ≥1e9-key escalation: k hash-range blooms, each built and
    // probed in sequence. k=1 must reproduce the single-bloom screen
    // EXACTLY (same inserted set, same filter params → identical bit
    // array → identical flags, FPs included). k=4 uses different
    // per-shard filters so FP patterns may differ, but the one-sided
    // guarantee cells cannot: every true duplicate flagged, exact_dup
    // identical, and for fresh docs maybe_seen ⟺ is_fp.
    val docs = ((0L until 200L).map(i => (i, s"seen document body number $i")) ++
        (200L until 300L).map(i => (i, s"seen document body number ${i - 200}")) ++
        (300L until 400L).map(i => (i, s"fresh unseen content ${i * 31}")))
      .toDF("doc_id", "text")
    def cells(shards: Int): Map[Long, (Long, Boolean, Boolean, Boolean)] =
      graft.operators.BloomDedup
        .screenReport(spark, docs, splitId = 200L, fpp = 0.01, shards = shards)
        .select(col("doc_id"), col("maybe_seen"), col("exact_dup"), col("is_fp"))
        .as[(Long, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    val single = cells(1)
    val k1 = graft.operators.BloomDedup
      .flagMaybeSeenSharded(spark,
        docs.filter(col("doc_id") < 200).select(col("doc_id"), xxhash64(col("text")).as("h")),
        docs.filter(col("doc_id") >= 200).select(col("doc_id"), xxhash64(col("text")).as("h")),
        "h", expectedItems = 200L, fpp = 0.01, shards = 1)
      .select(col("doc_id"), col("maybe_seen")).as[(Long, Boolean)].collect().toMap
    assert((200L until 400L).forall(i => k1(i) == single(i)._2),
      "shards=1 must be bit-identical to the unsharded screen")
    val k4 = cells(4)
    assert(k4.size == 200)
    (200L until 300L).foreach { i =>
      assert(k4(i)._2 && k4(i)._3 && !k4(i)._4,
        s"sharded screen lost a true duplicate: $i -> ${k4(i)}")
    }
    (300L until 400L).foreach { i =>
      assert(!k4(i)._3, s"fresh doc $i marked exact_dup under sharding")
      assert(k4(i)._2 == k4(i)._4, s"fresh doc $i: maybe_seen must equal is_fp")
    }
    assert((200L until 400L).forall(i => k4(i)._3 == single(i)._3),
      "exact_dup must not depend on sharding")
  }

  test("sharded bloom screen routes null hashes: never dropped, verdict false") {
    // `pmod(null, k) === i` is null → a bare shard filter would exclude
    // a null-hash row from EVERY shard's probe subset, silently
    // shrinking the output (round-11 ADVICE). The contract says a null
    // hash reads false, so the sharded form routes nulls to shard 0.
    val seen = Seq((1L, Option(10L)), (2L, Option(11L))).toDF("id", "h")
    val incoming =
      Seq((3L, Option(10L)), (4L, Option.empty[Long]),
        (5L, Option(99L)), (6L, Option.empty[Long])).toDF("id", "h")
    (1 to 4).foreach { k =>
      val out = graft.operators.BloomDedup
        .flagMaybeSeenSharded(spark, seen, incoming, "h",
          expectedItems = 2L, fpp = 0.01, shards = k)
        .select(col("id"), col("maybe_seen"))
        .as[(Long, Boolean)].collect().toMap
      assert(out.size == 4, s"shards=$k dropped rows: $out")
      assert(out(3L), s"shards=$k lost a true duplicate")
      assert(!out(4L) && !out(6L), s"shards=$k: a null hash must read false")
    }
  }

  test("bloom probe verdict is never null, even on a null hash") {
    // A null hash was never inserted; the contract is a non-null
    // false, not a propagated null (which would poison is_fp too).
    val bf = Seq(1L, 2L, 3L).toDF("h").stat.bloomFilter("h", 3L, 0.01)
    val out = graft.operators.BloomDedup
      .probe(spark, bf, Seq(Some(1L), None, Some(99L)).toDF("h"), "h")
      .select(col("maybe_seen")).as[Option[Boolean]].collect()
    assert(out.forall(_.isDefined), s"null verdict leaked: ${out.mkString(",")}")
    assert(out(0).contains(true) && out(1).contains(false))
  }

  test("bloom probe is a codegen'd native expression, not a UDF") {
    // The round-11 polish: the probe must stay inside the whole-stage
    // codegen span. No UDF invocation in the plan, and the strict
    // no-fallback mode must still execute (a doGenCode failure would
    // throw instead of silently interpreting).
    val bf = Seq(1L, 2L, 3L).toDF("h").stat.bloomFilter("h", 3L, 0.01)
    // spark.range, not a local Seq: ConvertToLocalRelation would fold
    // the probe away at optimization time and leave only a
    // LocalTableScan to assert on
    val df = graft.operators.BloomDedup
      .probe(spark, bf, spark.range(1, 3).select((col("id") * 49).as("h")), "h")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"probe regressed to a UDF:\n$plan")
    assert(plan.contains("bloom_probe"), s"native probe missing:\n$plan")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try assert(df.collect().length == 2)
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  // ---- z-score outliers -------------------------------------------------

  test("ts_outlier z math matches a hand-computed stddev on the fixture shape") {
    // Values 1..9 plus a 100 outlier for user 1; user 2 constant (sigma=0,
    // excluded); user 3 has < 5 events (excluded).
    val ev = ((1 to 9).map(i => (i.toLong, 1L, i.toDouble)) ++
        Seq((10L, 1L, 100.0)) ++
        (11 to 16).map(i => (i.toLong, 2L, 7.0)) ++
        (17 to 19).map(i => (i.toLong, 3L, i.toDouble)))
      .toDF("event_id", "user_id", "value")
    val stats = ev.groupBy(col("user_id")).agg(
        count(lit(1)).as("n"), avg(col("value")).as("mu"),
        stddev_samp(col("value")).as("sigma"))
      .filter(col("n") >= 5 && col("sigma") > 0)
    val out = ev.join(stats, "user_id")
      .withColumn("z", round((col("value") - col("mu")) / col("sigma"), 6))
      .filter(abs(col("z")) > 2)
      .select(col("event_id"), col("z")).as[(Long, Double)].collect().toMap
    // user 1: mu = 14.5, sigma_samp = sqrt(sum((x-mu)^2)/9); the 100 is
    // the only |z| > 2 point.
    val vals = (1 to 9).map(_.toDouble) :+ 100.0
    val mu = vals.sum / 10
    val sigma = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / 9)
    val expectedZ = BigDecimal((100.0 - mu) / sigma)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(10L), s"only the 100.0 point is an outlier: $out")
    assert(math.abs(out(10L) - expectedZ) < 1e-9,
      s"z mismatch: got ${out(10L)}, expected $expectedZ")
  }
}
