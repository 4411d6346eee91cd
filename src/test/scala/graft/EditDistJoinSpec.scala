package graft

import graft.operators.EditDistJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PassJoin segment blocking vs the quadratic truth (SURVEY.md §7.5):
  * the operator claims EXACT recall — candidates are a superset by the
  * pigeonhole argument — so every spec here is set-equality against
  * brute force, including an adversarial random-edit corpus that
  * exercises indels (position shifts), the short-string strata, and
  * the length-window boundary.
  */
class EditDistJoinSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def asSet(df: DataFrame): Set[(Long, Long, Int)] =
    df.select(col("d1").cast("long"), col("d2").cast("long"),
        col("dist").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def docsPrefix(len: Int): DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").as("id"), substring(col("text"), 1, len).as("t"))

  test("blocked pairs equal brute force on the real fixture (k=8, 120-prefix)") {
    val d = docsPrefix(120)
    val blocked = asSet(EditDistJoin.pairs(d, 8))
    val brute = asSet(EditDistJoin.bruteForcePairs(d, 8))
    assert(brute.nonEmpty, "fixture has no pairs at k=8 — vacuous test")
    assert(blocked === brute)
  }

  test("blocked pairs equal brute force at a wide dial (k=20, 60-prefix)") {
    // shorter prefixes + a wide threshold: segments shrink to ~2-3 chars
    // and the blocking has to survive heavy candidate collision
    val d = docsPrefix(60)
    val blocked = asSet(EditDistJoin.pairs(d, 20))
    val brute = asSet(EditDistJoin.bruteForcePairs(d, 20))
    assert(brute.nonEmpty)
    assert(blocked === brute)
  }

  test("random-edit corpus: every planted neighbor found, nothing extra (k=6)") {
    // Seeded adversarial generator: base strings over a SMALL alphabet
    // (segment collisions abound), mutated by 0..8 random edits —
    // insert, delete, substitute — so true distances straddle the
    // threshold and indels shift every downstream segment position.
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    def randStr(n: Int): String =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (0 until edits).foreach { _ =>
        val op = rnd.nextInt(3)
        val p = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        cur = op match {
          case 0 if cur.nonEmpty => cur.substring(0, p) + cur.substring(math.min(p + 1, cur.length)) // delete
          case 1 => cur.substring(0, p) + alpha(rnd.nextInt(alpha.length)) + cur.substring(p) // insert
          case _ if cur.nonEmpty => cur.substring(0, p) + alpha(rnd.nextInt(alpha.length)) + cur.substring(p + 1) // substitute
          case _ => cur + alpha(rnd.nextInt(alpha.length))
        }
      }
      cur
    }
    // 40 base strings of varied length (including the 3..8-char short
    // strata and lengths right at the k boundary), 3 mutants each
    val rows = (0 until 40).flatMap { b =>
      val len = Seq(3, 5, 7, 9, 12, 20, 40, 80)(b % 8)
      val base = randStr(len)
      val mutants = (1 to 3).map(m => mutate(base, rnd.nextInt(9)))
      (base +: mutants).zipWithIndex.map { case (t, j) => (b * 10L + j, t) }
    }
    import spark.implicits._
    val d = rows.toDF("id", "t")
    val blocked = asSet(EditDistJoin.pairs(d, 6))
    val brute = asSet(EditDistJoin.bruteForcePairs(d, 6))
    assert(brute.nonEmpty, "generator produced no close pairs — vacuous")
    assert(blocked === brute,
      s"missing=${brute -- blocked} extra=${blocked -- brute}")
  }

  test("cross-relation pairsAcross equals brute force on disjoint splits (k=6)") {
    import spark.implicits._
    // the fixture's docs split odd/even: every near pair straddling the
    // split must be found by the one-sided (left-indexes-only) scheme,
    // including left-short rows that bypass the segment index entirely
    val d = docsPrefix(80)
    val short = Seq((90001L, "abc"), (90002L, "abcde")).toDF("id", "t")
    val left = d.filter(col("id") % 2 === 0).unionByName(short)
    val right = d.filter(col("id") % 2 === 1)
      .unionByName(Seq((90003L, "abcd")).toDF("id", "t"))
    def asSetAcross(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select(col("d1").cast("long"), col("d2").cast("long"),
          col("dist").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = asSetAcross(graft.operators.EditDistJoin.pairsAcross(left, right, 6))
    val brute = asSetAcross(graft.operators.EditDistJoin.bruteForceAcross(left, right, 6))
    assert(brute.nonEmpty, "split produced no cross pairs — vacuous")
    assert(blocked === brute,
      s"missing=${brute -- blocked} extra=${blocked -- brute}")
    // the planted left-short (90001 "abc") × right-short (90003 "abcd")
    // pair rides the direct stratum
    assert(blocked.exists(p => p._1 == 90001L && p._2 == 90003L))
  }

  test("short×short and short×long strata are exact (strings at and below k)") {
    import spark.implicits._
    // lengths 2..14 around k=6: shorts pair wholesale, long×short rides
    // the long side's segments probed in the short string
    val d = Seq(
      (1L, "ab"), (2L, "abc"), (3L, "abcdef"), (4L, "abcdefg"),
      (5L, "abcdefgh"), (6L, "abcdefghijklmn"), (7L, "zz"),
      (8L, "abcdefghijklm"), (9L, "qrstuv")).toDF("id", "t")
    val blocked = asSet(EditDistJoin.pairs(d, 6))
    val brute = asSet(EditDistJoin.bruteForcePairs(d, 6))
    assert(blocked === brute)
    // the (1,7) pair: both length 2, distance 2 ≤ 6 — the both-short
    // unconditional-emit path
    assert(blocked.exists(p => p._1 == 1L && p._2 == 7L))
  }

  test("duplicate-heavy short stratum: grouped pairing equals brute force") {
    import spark.implicits._
    // ADVICE r15: crawl corpora are dense in degenerate shorts. 30
    // copies of "" and "ab", 10 of "abc", plus distinct shorts and a
    // long row — the grouped path must emit every within-group (dist 0)
    // and cross-group pair exactly once, with lens following their ids.
    val d = (
      (0 until 30).map(i => (100L + i, "")) ++
      (0 until 30).map(i => (200L + i, "ab")) ++
      (0 until 10).map(i => (300L + i, "abc")) ++
      Seq((400L, "xyzzzz"), (401L, "q"), (500L, "abcdefghijklmnop"))
    ).toDF("id", "t")
    val blocked = EditDistJoin.pairs(d, 6)
    val brute = EditDistJoin.bruteForcePairs(d, 6)
    assert(asSet(blocked) === asSet(brute))
    // lens must travel with their ids across the least/greatest swap
    val full = blocked.select(col("d1"), col("d2"), col("len1"), col("len2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val fullBrute = brute.select(col("d1"), col("d2"), col("len1"), col("len2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(full === fullBrute)
    // within-group mass: 30 copies of "" alone are C(30,2) = 435 pairs
    assert(asSet(blocked).count(p => p._3 == 0) >= 435)
  }

  test("pairsAgainstIndex with OVERLAPPING doc sets emits no self pairs") {
    import spark.implicits._
    // ADVICE r15 latent bug: a doc on both sides used to emit (d, d, 0).
    // Overlap long docs (the segment-join path) AND a short doc (the
    // direct-verify stratum); both guards must hold.
    val docs = Seq(
      (1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnoX"),
      (3L, "abc"), (4L, "abd")).toDF("id", "t")
    val got = EditDistJoin.pairsAgainstIndex(
      EditDistJoin.segmentIndex(docs, 6), docs, docs, 6)
      .select(col("d1").cast("long"), col("d2").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall(p => p._1 != p._2), s"self pairs leaked: ${got.toSeq}")
    // the real cross pairs still appear (both orientations — the
    // one-sided index reports (index id, probe id))
    assert(got.contains((1L, 2L)) && got.contains((2L, 1L)))
    assert(got.contains((3L, 4L)) && got.contains((4L, 3L)))
  }
}
