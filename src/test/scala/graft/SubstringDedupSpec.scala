package graft

import graft.operators.SubstringDedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-corpus gates for the character-gram repeated-substring
  * operator: span detection with the exact expected gram count, the
  * drop-WHOLE group cap, the minShared filter, and the short-doc edge.
  */
class SubstringDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // A 44-char span embedded in two otherwise-unrelated docs. Unique
  // fillers guarantee no accidental cross-doc grams; distinct chars
  // inside the span guarantee its grams are distinct.
  private val span = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH" // 44 chars
  private val docs = Seq(
    (1L, s"UNIQUEFILLERONEx${span}yQQQQQQQQQQQQQQQQ"),
    (2L, s"ZZZZZZZZZZZZZZZZp${span}qOTHERFILLERTWOX"),
    (3L, "a completely unrelated document long enough to have grams but sharing none")
  ).toDF("doc_id", "text")

  test("a shared 44-char span yields exactly 5 shared 40-grams") {
    val pairs = SubstringDedup.sharedGramPairs(docs, gramLen = 40, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // span length 44 ⇒ 44 − 40 + 1 = 5 contiguous shared grams; the
    // surrounding fillers differ so no other gram is shared.
    assert(pairs.toSeq === Seq((1L, 2L, 5L)))
  }

  test("minShared filters pairs below the threshold") {
    assert(SubstringDedup.sharedGramPairs(docs, minShared = 5).count() === 1L)
    assert(SubstringDedup.sharedGramPairs(docs, minShared = 6).count() === 0L)
  }

  test("oversized gram groups are dropped WHOLE, with observability") {
    // Three docs all sharing the span: every span gram's group has 3
    // members. maxGroup=2 must drop every shared group (no truncation to
    // an arbitrary 2-subset) and droppedGrams must count them.
    val three = docs.where($"doc_id" =!= 3L).union(
      Seq((4L, s"YETANOTHERFILLmm${span}nPADPADPADPADPADP")).toDF("doc_id", "text"))
    assert(SubstringDedup.sharedGramPairs(three, minShared = 1, maxGroup = 2)
      .count() === 0L)
    assert(SubstringDedup.droppedGrams(three, maxGroup = 2) === 5L)
    // at a sufficient cap all 3 pairs surface with the full count
    val pairs = SubstringDedup.sharedGramPairs(three, minShared = 1, maxGroup = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 5L), (1L, 4L, 5L), (2L, 4L, 5L)))
  }

  test("docs shorter than gramLen produce no grams and no pairs") {
    val withShort = docs.union(Seq((5L, "tiny"), (6L, "tiny")).toDF("doc_id", "text"))
    val pairs = SubstringDedup.sharedGramPairs(withShort, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs.exists(p => p._1 >= 5L || p._2 >= 5L))
    assert(SubstringDedup.grams(Seq((7L, "x" * 39)).toDF("doc_id", "text"))
      .count() === 0L)
  }

  test("candidates() dispatches exact/winnow to the same-contract pair sets") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "shared").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact mode IS sharedGramPairs (the dedup_substring oracle shape)
    assert(pairs(SubstringDedup.candidates(docs, mode = "exact")) ===
      pairs(SubstringDedup.sharedGramPairs(docs)))
    // winnow mode at the dedup_winnow dial: its pairs are a SUBSET of
    // the exact pairs at the same gram length (a shared fingerprint is
    // a shared gram — never spurious), and non-empty on this corpus
    val win = pairs(SubstringDedup.candidates(docs, mode = "winnow",
      gramLen = 20, minShared = 1L))
    val exact20 = pairs(SubstringDedup.candidates(docs, mode = "exact",
      gramLen = 20, minShared = 1L)).map(p => (p._1, p._2))
    assert(win.nonEmpty)
    assert(win.map(p => (p._1, p._2)).subsetOf(exact20),
      "winnow emitted a pair with no shared 20-gram")
    intercept[IllegalArgumentException] {
      SubstringDedup.candidates(docs, mode = "minhash")
    }
  }

  test("text_repetition stays bounded and its value equality holds vs DuckDB") {
    // Value-level correctness is the driver's DuckDB oracle (the query is
    // oracle-checked); this gate pins the invariants the oracle compare
    // assumes: one row per doc, fracs in [0, 1], deterministic argmax.
    import org.apache.spark.sql.functions._
    val rep = graft.queries.LlmOps.queries("text_repetition")(
      spark, "/root/testdata/sf0.001")
    val fr = rep.select(
      count(lit(1)), countDistinct(col("doc_id")),
      min(col("top_bigram_frac")), max(col("top_bigram_frac")),
      min(col("dup_trigram_frac")), max(col("dup_trigram_frac"))).collect()(0)
    assert(fr.getLong(0) === fr.getLong(1), "one row per doc")
    assert(fr.getDouble(2) >= 0.0 && fr.getDouble(3) <= 1.0)
    assert(fr.getDouble(4) >= 0.0 && fr.getDouble(5) <= 1.0)
    // deterministic tiebreak: "a a a a b" → top bigram ("a a", 3) of 4
    // slots; all-count-1 ties pick the bytewise-greatest bigram ("c d").
    val crafted = graft.queries.LlmOps.queries("text_repetition")
    val two = Seq((1L, "a a a a b"), (2L, "a b c d")).toDF("doc_id", "text")
    // route the crafted frame through the same expression chain by a
    // temp-dir parquet round-trip (the query reads Tables(dir))
    val dir = java.nio.file.Files.createTempDirectory("repspec").toString
    two.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = crafted(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out(0) === ((1L, "a a", 3L, 0.75, 0.333333)))
    assert(out(1) === ((2L, "c d", 1L, rnd6(1.0 / 3), 0.0)))
  }

  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
