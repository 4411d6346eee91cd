package graft

import graft.operators.BpeTrain
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge training: the relational gaps-and-islands form must equal
  * the textbook sequential left-to-right scan — including greedy
  * overlap resolution, which is exactly where a naive "merge every
  * match" implementation diverges ("aaa" under (a,a) is "aa"+"a",
  * never a+"aa", and the pair counts of every LATER round depend on
  * getting it right).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def run(words: Seq[(String, Long)], k: Int) =
    BpeTrain.trainMerges(words.toDF("w", "c"), k)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("the Sennrich corpus learns the textbook merges") {
    // the ACL-2016 worked example: {low:5, lower:2, newest:6, widest:3}
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val got = run(words, 4)
    assert(got === BpeTrain.referenceMerges(words, 4))
    // round 1 must be (e,s) at freq 9 (newest 6 + widest 3) — ties on
    // 'es'+'t' resolve at round 2
    assert(got.head === ((1, "e", "s", "es", 9L)))
    assert(got(1) === ((2, "es", "t", "est", 9L)))
  }

  test("greedy overlap: runs of a repeated symbol merge left-to-right") {
    // "aaaa" -> (a,a) applies at offsets 0 and 2 -> "aa aa";
    // "aaa" -> "aa a" (the trailing a survives); round 2's best pair is
    // then (aa,aa) from the even run — wrong overlap handling would
    // instead see (a,aa) / (aa,a) mass
    val words = Seq(("aaaa", 3L), ("aaa", 2L), ("ab", 1L))
    val got = run(words, 2)
    assert(got === BpeTrain.referenceMerges(words, 2))
    assert(got.head._4 === "aa")
    // freq of (a,a): aaaa contributes 3 pairs x3? NO — pair COUNTS are
    // occurrence counts in the sequence: aaaa has 3 adjacent (a,a)
    // positions, aaa has 2 -> 3*3 + 2*2 = 13
    assert(got.head._5 === 13L)
    assert(got(1) === ((2, "aa", "aa", "aaaa", 3L)))
  }

  test("relational equals sequential on a seeded random small-alphabet corpus") {
    val rnd = new scala.util.Random(7)
    val alpha = "abc"
    val words = (0 until 60).map { _ =>
      val len = 1 + rnd.nextInt(10)
      ((0 until len).map(_ => alpha(rnd.nextInt(3))).mkString,
        1L + rnd.nextInt(5))
    }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
    assert(run(words, 8) === BpeTrain.referenceMerges(words, 8))
  }

  test("relational equals sequential on the real fixture word table") {
    val words: DataFrame = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(filter(split(lower(col("text")), " "),
        (t: org.apache.spark.sql.Column) => t =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val ref = BpeTrain.referenceMerges(
      words.collect().map(r => (r.getString(0), r.getLong(1))).toSeq, 6)
    val got = BpeTrain.trainMerges(words, 6)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === ref)
  }

  test("encodeWords equals the sequential reference encoder on the fixture vocabulary") {
    val words = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(filter(split(lower(col("text")), " "),
        (t: org.apache.spark.sql.Column) => t =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val merges = BpeTrain.trainMerges(words, 6)
      .orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = BpeTrain.encodeWords(words.select(col("w")), merges)
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    val ref = BpeTrain.referenceEncode(got.keySet.toSeq, merges)
    assert(got === ref)
    // the merges actually compressed something — not a vacuous identity
    assert(got.exists { case (w, n) => n < w.length },
      "no word compressed below its character count — vacuous merges")
  }

  test("an exhausted corpus fails loudly instead of under-delivering merges") {
    // single-char words have no adjacent pairs at all
    val e = intercept[IllegalArgumentException] {
      run(Seq(("a", 5L), ("b", 3L)), 1)
    }
    assert(e.getMessage.contains("exhausted"))
  }

  test("encodeWordsVocab equals the sequential longest-match reference on the fixture") {
    val words = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(filter(split(lower(col("text")), " "),
        (t: org.apache.spark.sql.Column) => t =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val merged = BpeTrain.trainMerges(words, 6)
      .orderBy("step").collect().map(_.getString(3)).toSeq
    val chars = words
      .select(explode(sequence(lit(1), length(col("w")))).as("p"), col("w"))
      .select(col("w").substr(col("p"), lit(1)).as("ch"))
      .distinct().collect().map(_.getString(0)).toSeq
    val vocab = (chars ++ merged).toSet
    val got = BpeTrain.encodeWordsVocab(words.select(col("w")), vocab.toSeq)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === BpeTrain.referenceLongestMatch(got.keySet.toSeq, vocab))
    assert(got.exists { case (w, n) => n < w.length },
      "no word compressed below its character count — vacuous vocab")
  }

  test("longest-match is the SERVING trade: it can differ from merge-order encoding") {
    // merges learned in order (a,b) then (ab,c): merge-order encodes
    // "abc" as [abc] too — but on "xabc" both agree while a vocab
    // containing "bc" (from some other merge path) would diverge. Build
    // the canonical divergence directly: vocab {a, b, c, bc, ab, abc}
    // with merge list ((b,c)) — merge-order gives a+[bc] = 2 tokens,
    // longest-match takes [ab]+c = 2... use the textbook case instead:
    // vocab {a, b, c, ab, bcc...}. Keep it concrete and assert the
    // DOCUMENTED behavior: longest match takes the longest prefix even
    // when the merge order would never have produced it.
    val vocab = Seq("a", "b", "c", "bc", "abc")
    val got = BpeTrain.encodeWordsVocab(Seq("abc", "bbc").toDF("w"), vocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abc" -> [abc] (1 token): merge list ((b,c)) alone would give
    // a+[bc] = 2 — the forms differ, and the vocab form is the one this
    // operator ships
    assert(got("abc") === 1L)
    assert(got("bbc") === 2L) // b + [bc]
    // byte-fallback: unknown characters consume one position each
    val fb = BpeTrain.encodeWordsVocab(Seq("azb").toDF("w"), Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fb("azb") === 3L)
  }

  test("trainMerges roundHook reports a state that shrinks every round") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val sizes = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    BpeTrain.trainMerges(words.toDF("w", "c"), 4,
      roundHook = (k, n) => sizes += ((k, n)))
    assert(sizes.map(_._1).toSeq === Seq(1, 2, 3, 4))
    val ns = sizes.toSeq.map(_._2)
    assert(ns.sliding(2).forall(w => w(1) < w(0)),
      s"state did not shrink monotonically: $sizes")
  }
}
