package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Extra5

/** Crafted-input tests for the round-11 Extra5 export-wave operators.
  * The DuckDB oracle is the primary gate; this spec pins the
  * algorithmic properties hash-comparison can't show: chunk coverage/
  * overlap, nearest-rank band math, BM25 monotonicity, and the
  * ORDER-INDEPENDENCE of the shard manifest checksum (the property that
  * makes it partial-aggregable at scale).
  */
class Extra5Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // ---- text_chunk ------------------------------------------------------

  test("text_chunk: chunks cover every token and overlap by size-stride") {
    val rows = Extra5.queries("text_chunk")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, ch) =>
      val sorted = ch.sortBy(_.getLong(1))
      // indices are dense from 0
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq)
      // last chunk starts at stride*(k-1) and the index rule guarantees
      // lastLen <= stride < size, so N = stride*(k-1) + lastLen exactly;
      // every chunk i then has length min(size, N - i*stride) — with
      // overlap the second-to-last chunk may be partial too (N=51 →
      // 32, 27, 3), which is the correct covering rule, not a bug.
      val lastLen = sorted.last.getLong(2)
      assert(lastLen >= 1L && lastLen <= Extra5.ChunkStride.toLong)
      val n = Extra5.ChunkStride.toLong * (sorted.length - 1) + lastLen
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) ==
          math.min(Extra5.ChunkSize.toLong, n - i * Extra5.ChunkStride.toLong))
      }
    }
  }

  test("text_chunk: a doc shorter than one chunk yields exactly one partial chunk") {
    import spark.implicits._
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
    one.createOrReplaceTempView("ignored")
    val chunks = one
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor((size(split(col("text"), " ")) - 1) /
            lit(Extra5.ChunkStride.toDouble)).cast("int"))).as("i"))
      .collect()
    assert(chunks.length == 1 && chunks.head.getInt(1) == 0)
  }

  // ---- corpus_prune ----------------------------------------------------

  test("corpus_prune: band keeps ~90% and bounds hold") {
    val rows = Extra5.queries("corpus_prune")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1)).sum
    val kept = rows.map(_.getLong(2)).sum
    // nearest-rank [P5,P95] keeps at least 85% and never more than all
    assert(kept <= n && kept >= (n * 0.80).toLong,
      s"kept $kept of $n outside the expected band")
    rows.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(5), "lo must be <= hi")
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  // ---- text_bm25 -------------------------------------------------------

  test("text_bm25: scores positive, bounded count, deterministic") {
    val a = Extra5.queries("text_bm25")(spark, sf).collect()
    val b = Extra5.queries("text_bm25")(spark, sf).collect()
    assert(a.nonEmpty && a.length <= 100)
    a.foreach(r => assert(r.getDouble(1) > 0.0, "BM25 with +1 idf is strictly positive"))
    assert(a.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("text_bm25: saturation — tf doubling gains less than score doubling") {
    import spark.implicits._
    // two synthetic docs, identical length, one with 2x the term count:
    // k1 saturation requires score(d2) < 2*score(d1)
    val docs = Seq(
      (1L, "spark x x x x x x x"),
      (2L, "spark spark x x x x x x")).toDF("doc_id", "text")
    val terms = Seq("spark")
    val tok = docs.select(col("doc_id"),
      filter(split(lower(col("text")), " "), t => t =!= "").as("t"))
    val dl = tok.select(col("doc_id"), size(col("t")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl").cast("double")).as("avgdl"))
    val tf = tok.select(col("doc_id"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val score = idf * col("tf") * Extra5.BmK1p1 /
      (col("tf") + lit(Extra5.BmK1) * (lit(Extra5.BmOneMinusB) +
        lit(Extra5.BmB) * col("dl") / col("avgdl")))
    val m = tf.join(dfr, "term").join(dl, "doc_id").crossJoin(stats)
      .groupBy(col("doc_id")).agg(sum(score).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(2L) > m(1L), "more matches must score higher")
    assert(m(2L) < 2.0 * m(1L), "k1 saturation must be sub-linear in tf")
  }

  // ---- sample_temperature ----------------------------------------------

  test("sample_temperature: alpha < 1 flattens the source distribution toward uniform") {
    val rows = Extra5.queries("sample_temperature")(spark, sf).collect()
    assert(rows.length > 1)
    val pRaw = rows.map(_.getDouble(3))
    val pTemp = rows.map(_.getDouble(4))
    // both are (rounded) probability vectors
    assert(math.abs(pRaw.sum - 1.0) < 0.01 && math.abs(pTemp.sum - 1.0) < 0.01)
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    assert(variance(pTemp) <= variance(pRaw) + 1e-12,
      "temperature scaling must move the distribution toward uniform")
    // order preserved: bigger sources never become smaller-probability
    val byTokens = rows.sortBy(_.getLong(2))
    assert(byTokens.map(_.getDouble(4)).sliding(2).forall {
      case Array(a, b) => a <= b + 1e-9; case _ => true
    }, "temperature scaling must preserve the source ordering")
  }

  // ---- win_interval_merge ----------------------------------------------

  test("interval merge: running max handles containment (swallowed span does not reopen)") {
    import spark.implicits._
    // user 1: [0,100), [10,20), [90,200) — all one interval because the
    // FIRST span's end (100) bridges past the short swallowed one; a
    // lag(e)-based flag would see 20 < 90 and wrongly split.
    val iv = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 90L, 200L),
      (1L, 4L, 300L, 400L),
      (2L, 5L, 0L, 10L), (2L, 6L, 10L, 20L) // touching spans merge
    ).toDF("user_id", "event_id", "s", "e")
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      .rowsBetween(Long.MinValue, -1)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      .rowsBetween(Long.MinValue, 0)
    val m = iv
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("ng", when(col("pmax").isNull || col("s") > col("pmax"), 1).otherwise(0))
      .withColumn("g", sum(col("ng")).over(wCum))
      .groupBy(col("user_id"), col("g"))
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(m.toSeq == Seq((1L, 0L, 200L, 3L), (1L, 300L, 400L, 1L), (2L, 0L, 20L, 2L)))
  }

  test("win_interval_merge: merged intervals are disjoint per user and cover all events") {
    val rows = Extra5.queries("win_interval_merge")(spark, sf).collect()
    val total = rows.map(_.getLong(3)).sum
    assert(total == Tables(spark, sf, "events").count())
    rows.groupBy(_.getLong(0)).foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(_.getTimestamp(1).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.getTimestamp(2).after(b.getTimestamp(1)),
            "merged intervals must not overlap")
        case _ =>
      }
    }
  }

  // ---- agg_mode --------------------------------------------------------

  test("agg_mode: ties resolve to the smallest value") {
    import spark.implicits._
    val df = Seq(("A", 1.0), ("A", 1.0), ("A", 2.0), ("A", 2.0), ("A", 3.0))
      .toDF("k", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("cnt").desc, col("v").asc)
    val m = df.groupBy(col("k"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect()
    assert(m.length == 1 && m.head.getDouble(1) == 1.0,
      "tie between counts must pick the smallest value")
  }

  // ---- embed_project ---------------------------------------------------

  test("embed_project: JL projection preserves norms in expectation") {
    val rows = Extra5.queries("embed_project")(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = Tables(spark, sf, "embeddings")
      .filter(col("embedding").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val ratios = rows.map { r =>
      val pn2 = (1 to graft.queries.Extra5.ProjK)
        .map(j => r.getDouble(j)).map(x => x * x).sum
      val xn2 = emb(r.getLong(0)).map(x => x.toDouble * x).sum
      pn2 / xn2
    }
    val mean = ratios.sum / ratios.length
    // E[||p||^2] = ||x||^2 for the 1/sqrt(k)-scaled Rademacher matrix;
    // k=8 gives per-vector variance, but the corpus mean concentrates
    assert(mean > 0.6 && mean < 1.6,
      s"mean norm ratio $mean outside the JL concentration band")
  }

  test("embed_project: matrix is the deterministic md5 derivation") {
    // recompute entry (j=0, d=0..2) by hand and check a projected value
    import graft.queries.Extra5.{ProjSigns, ProjK, EmbDim}
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 3).foreach { d =>
      val h = md.digest(s"0:$d".getBytes("UTF-8")); md.reset()
      val expect = if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
      assert(ProjSigns(0)(d) == expect)
    }
    assert(ProjSigns.length == ProjK && ProjSigns.forall(_.length == EmbDim))
    assert(ProjSigns.flatten.count(_ > 0) > 100 &&
      ProjSigns.flatten.count(_ < 0) > 100, "signs must be mixed")
  }

  // ---- text_bigram_xent ------------------------------------------------

  test("text_bigram_xent: predictable bigrams score lower cross-entropy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y x y x y"),   // one dominant bigram pattern
      (2L, "x q y z q x z y q z")    // scrambled transitions
    ).toDF("doc_id", "text")
    val bg = docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), " "), t => t =!= "").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val cr = bg.groupBy(col("w2")).agg(count(lit(1)).as("cr"))
    val tot = bg.agg(count(lit(1)).as("tt"))
    val p = lit(0.9) * col("c12") / col("c1") + lit(0.1) * col("cr") / col("tt")
    val m = bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1")).join(cr, Seq("w2"))
      .crossJoin(tot)
      .groupBy(col("doc_id")).agg((-avg(log(p))).as("xent"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) < m(2L),
      s"repetitive doc must be more predictable: ${m(1L)} vs ${m(2L)}")
    assert(m.values.forall(_ > 0.0), "cross-entropy of non-degenerate corpus is positive")
  }

  test("text_bigram_xent: every multi-token doc gets a row") {
    val rows = Extra5.queries("text_bigram_xent")(spark, sf).collect()
    val expected = Tables(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .filter(size(filter(split(lower(col("text")), " "), t => t =!= "")) >= 2)
      .count()
    assert(rows.length.toLong == expected)
    rows.foreach(r => assert(r.getDouble(2) > 0.0))
  }

  // ---- quality_lr ------------------------------------------------------

  test("quality_lr: training is deterministic and recovers the rule") {
    val a = Extra5.queries("quality_lr")(spark, sf).collect().head
    val b = Extra5.queries("quality_lr")(spark, sf).collect().head
    assert(a.toSeq == b.toSeq, "per-iteration 1e-6 snapping must make training deterministic")
    val (tp, fp, tn, fn) = (a.getLong(4), a.getLong(5), a.getLong(6), a.getLong(7))
    assert(tp + fn > 0 && tn + fp > 0, "both classes must be present")
    val acc = (tp + tn).toDouble / (tp + fp + tn + fn)
    assert(acc >= 0.9, s"classifier must recover the quality rule, got acc=$acc")
  }

  // ---- export_shards ---------------------------------------------------

  test("export_shards: manifest is partitioning- and order-invariant") {
    val base = Extra5.queries("export_shards")(spark, sf)
    val a = base.collect().map(_.toSeq).toSeq
    // same computation over a deliberately re-shuffled input: the
    // checksum is a commutative sum, so every cell must be identical
    val docs = Tables(spark, sf, "documents").repartition(7).sortWithinPartitions(col("n_chars"))
    val b = docs
      .filter(col("text").isNotNull)
      .select(
        substring(md5(col("doc_id").cast("string")), 1, 1).as("shard"),
        col("n_chars"),
        size(filter(split(col("text"), " "), t => t =!= "")).as("ntok"),
        conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long").as("hk"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).cast("long").as("total_tokens"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("hk")).as("min_key"), max(col("hk")).as("max_key"),
        sum(col("hk")).cast("long").as("checksum"))
      .orderBy(col("shard"))
      .collect().map(_.toSeq).toSeq
    assert(a == b, "shard manifest must not depend on input partitioning/order")
  }

  test("export_shards: doc counts partition the corpus") {
    val rows = Extra5.queries("export_shards")(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val corpus = Tables(spark, sf, "documents").filter(col("text").isNotNull).count()
    assert(total == corpus, "every doc lands in exactly one shard")
  }
}
