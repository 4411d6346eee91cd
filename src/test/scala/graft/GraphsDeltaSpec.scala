package graft

import graft.operators.Graphs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Incremental graph maintenance (round-16 verdict #4): applyDelta must
  * be INDISTINGUISHABLE from the full rebuild over the merged edge set
  * — all four frames row-identical — on the deltas that stress its
  * shortcuts: overlapping edges (the anti-join), reversed orientations
  * and duplicates (canonicalization), and degree-rank FLIPS (the
  * only-touched-edges re-orientation claim: an untouched edge must keep
  * its old orientation rows, a touched one must re-derive them from the
  * merged degrees).
  */
class GraphsDeltaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def checkAgainstRebuild(base: Seq[(Long, Long)],
                                  delta: Seq[(Long, Long)],
                                  tag: String): Unit = {
    val s = spark.newSession()
    Graphs.index(base.toDF("a", "b"), tag, s)
    val got = Graphs.applyDelta(tag, s, delta.toDF("a", "b"))
    // full rebuild over the canonical merged set, independent tag
    val canon = (base ++ delta.map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) }).filter(e => e._1 != e._2).distinct
    val want = Graphs.index(canon.toDF("a", "b"), s"$tag-rebuild", s)
    assert(pairs(got.edges) === pairs(want.edges), s"$tag: edges diverged")
    assert(pairs(got.adj) === pairs(want.adj), s"$tag: adjacency diverged")
    assert(pairs(got.deg) === pairs(want.deg), s"$tag: degrees diverged")
    assert(pairs(got.oriented) === pairs(want.oriented),
      s"$tag: orientation diverged")
    // and the cache now serves the MERGED graph under the original tag
    val served = Graphs.index(
      sys.error("must serve, not build"): DataFrame, tag, s)
    assert(pairs(served.edges) === pairs(want.edges))
    Graphs.clear(s)
  }

  test("overlapping + reversed + duplicate delta equals the full rebuild") {
    checkAgainstRebuild(
      base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)),
      // (2,3) already present; (4,3) reversed duplicate of (3,4);
      // (5,5) self-loop must drop; (4,5)/(5,6) genuinely new; (4,5) twice
      delta = Seq((2L, 3L), (4L, 3L), (5L, 5L), (4L, 5L), (5L, 4L), (5L, 6L)),
      tag = "delta-overlap")
  }

  test("degree-rank-flipping delta re-orients exactly the touched edges") {
    // base: deg(1)=3, deg(2)=1, deg(3)=1, deg(4)=1, deg(5)=2, deg(6)=1
    // edge (1,5): 5 has lower degree -> oriented 5->1.
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 1L), (5L, 6L))
    // delta pumps node 5's degree to 4 (> deg(1)=4? deg(1) stays 4 after
    // (5,1)... counts: adding (5,7),(5,8),(5,9) makes deg(5)=5 > deg(1)=4
    // so the (1,5) edge must FLIP to 1->5 — a rank flip on an edge the
    // delta does not contain, caught only because 5 is an affected node
    val delta = Seq((5L, 7L), (5L, 8L), (5L, 9L))
    checkAgainstRebuild(base, delta, "delta-flip")

    // the explicit flip assertion (belt and braces over the rebuild
    // equality): after the delta, (1,5) orients 1->5
    val s = spark.newSession()
    Graphs.index(base.toDF("a", "b"), "delta-flip2", s)
    val got = Graphs.applyDelta("delta-flip2", s, delta.toDF("a", "b"))
    assert(pairs(got.oriented).contains((1L, 5L)) &&
      !pairs(got.oriented).contains((5L, 1L)),
      "degree-rank flip was not re-oriented")
    Graphs.clear(s)
  }

  test("empty and fully-duplicate deltas are no-ops") {
    val base = Seq((1L, 2L), (2L, 3L))
    val s = spark.newSession()
    val before = Graphs.index(base.toDF("a", "b"), "delta-noop", s)
    val b4 = (pairs(before.edges), pairs(before.adj), pairs(before.deg),
      pairs(before.oriented))
    val after = Graphs.applyDelta("delta-noop", s,
      Seq((2L, 1L), (3L, 2L)).toDF("a", "b"))
    assert((pairs(after.edges), pairs(after.adj), pairs(after.deg),
      pairs(after.oriented)) === b4)
    Graphs.clear(s)
  }

  test("applyDelta without a cached graph fails loudly") {
    val s = spark.newSession()
    intercept[IllegalStateException] {
      Graphs.applyDelta("delta-missing", s, Seq((1L, 2L)).toDF("a", "b"))
    }
  }

  test("applyDeltaWeighted: min-weight merge equals the weighted rebuild") {
    val s = spark.newSession()
    def w3(df: DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = Seq((1L, 2L, 5L), (2L, 3L, 3L), (3L, 4L, 7L))
    Graphs.weighted(base.toDF("a", "b", "w"), "wdelta", s)
    // (2,1,2): cheaper re-arrival (replaces 5); (3,2,9): costlier —
    // no-op; (4,5,1): new; (1,2,4)+(2,1,2): same pair twice, min wins
    val delta = Seq((2L, 1L, 4L), (2L, 1L, 2L), (3L, 2L, 9L), (4L, 5L, 1L))
    val got = Graphs.applyDeltaWeighted("wdelta", s, delta.toDF("a", "b", "w"))
    val expected = Set((1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 7L), (4L, 5L, 1L))
    assert(w3(got.edges) === expected)
    assert(w3(got.sym) === expected.flatMap { case (a, b, w) =>
      Set((a, b, w), (b, a, w)) })
    // served under the original tag; sssp over the merged frames uses
    // the cheaper (1,2) edge
    val served = Graphs.weighted(
      sys.error("must serve"): DataFrame, "wdelta", s)
    assert(w3(served.edges) === expected)
    import org.apache.spark.sql.functions.col
    val d = graft.operators.Bfs.weightedDistancesOnSym(served.sym,
      Seq(1L).toDF("v"), rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(d === Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 12L, 5L -> 13L))
    Graphs.clear(s)
  }

  private def checkRemoveAgainstRebuild(base: Seq[(Long, Long)],
                                        removals: Seq[(Long, Long)],
                                        tag: String): Unit = {
    val s = spark.newSession()
    Graphs.index(base.toDF("a", "b"), tag, s)
    val got = Graphs.applyDeltaRemove(tag, s, removals.toDF("a", "b"))
    // full rebuild over the subtracted canonical set, independent tag
    val rmCanon = removals.map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val canon = base.filterNot(rmCanon.contains)
    val want = Graphs.index(canon.toDF("a", "b"), s"$tag-rebuild", s)
    assert(pairs(got.edges) === pairs(want.edges), s"$tag: edges diverged")
    assert(pairs(got.adj) === pairs(want.adj), s"$tag: adjacency diverged")
    assert(pairs(got.deg) === pairs(want.deg), s"$tag: degrees diverged")
    assert(pairs(got.oriented) === pairs(want.oriented),
      s"$tag: orientation diverged")
    val served = Graphs.index(
      sys.error("must serve, not build"): DataFrame, tag, s)
    assert(pairs(served.edges) === pairs(want.edges))
    Graphs.clear(s)
  }

  test("removal delta (absent pairs, reversed, duplicates) equals the subtracted rebuild") {
    checkRemoveAgainstRebuild(
      base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)),
      // (3,2) reversed form of a present edge; (4,5) present; (7,8)
      // absent (no-op); (2,3) duplicate of the reversed removal
      removals = Seq((3L, 2L), (2L, 3L), (4L, 5L), (7L, 8L)),
      tag = "rm-mixed")
  }

  test("degree-rank-flipping removal re-orients exactly the touched survivors") {
    // base: deg(5)=5 > deg(1)=4, so (1,5) orients 1->5. Removing three
    // of 5's spokes drops deg(5) to 2 < deg(1)=4: the SURVIVING edge
    // (1,5) — which the removal never names — must flip back to 5->1,
    // caught only because 5 is an affected endpoint.
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 1L), (5L, 6L),
      (5L, 7L), (5L, 8L), (5L, 9L))
    val removals = Seq((5L, 7L), (5L, 8L), (5L, 9L))
    checkRemoveAgainstRebuild(base, removals, "rm-flip")

    val s = spark.newSession()
    Graphs.index(base.toDF("a", "b"), "rm-flip2", s)
    val got = Graphs.applyDeltaRemove("rm-flip2", s, removals.toDF("a", "b"))
    assert(pairs(got.oriented).contains((5L, 1L)) &&
      !pairs(got.oriented).contains((1L, 5L)),
      "degree-rank flip BY removal was not re-oriented")
    // node 9 lost its only edge: it must leave the degree table, as a
    // rebuild's adjacency groupBy would never emit it
    assert(!got.deg.collect().map(_.getLong(0)).contains(9L),
      "isolated node survived in the degree table")
    Graphs.clear(s)
  }

  test("add then remove round-trips to the original graph") {
    val s = spark.newSession()
    val base = Seq((1L, 2L), (2L, 3L))
    val extra = Seq((3L, 4L), (4L, 5L))
    val before = Graphs.index(base.toDF("a", "b"), "rm-roundtrip", s)
    val b4 = (pairs(before.edges), pairs(before.adj), pairs(before.deg),
      pairs(before.oriented))
    Graphs.applyDelta("rm-roundtrip", s, extra.toDF("a", "b"))
    val after = Graphs.applyDeltaRemove("rm-roundtrip", s, extra.toDF("a", "b"))
    assert((pairs(after.edges), pairs(after.adj), pairs(after.deg),
      pairs(after.oriented)) === b4)
    Graphs.clear(s)
  }

  test("applyDeltaRemove without a cached graph fails loudly") {
    val s = spark.newSession()
    intercept[IllegalStateException] {
      Graphs.applyDeltaRemove("rm-missing", s, Seq((1L, 2L)).toDF("a", "b"))
    }
  }

  test("graph_bfs_delta after Graphs.clear rebuilds instead of hard-failing (r17 verdict #1)") {
    // The shipped r17 bug: a side memo ("delta already applied") survived
    // Graphs.clear, so a cleared session's next graph_bfs_delta call
    // skipped the build but found no cache entry — a permanent
    // 'merged entry missing' error. The guard now keys on cache
    // PRESENCE (Graphs.cachedGraph), so clear ⇒ rebuild, and the exact
    // AllQueriesSpec-then-PlanSpec ordering reproduces in miniature here:
    // serve, clear, serve again, same rows both times.
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("graph_bfs_delta")
    val s = spark.newSession()
    val first = q(s, dir).collect().toSeq
    assert(first.nonEmpty)
    Graphs.clear(s)
    val second = q(s, dir).collect().toSeq // must rebuild, not throw
    assert(second === first, "post-clear rebuild diverged from first serve")
    assert(Graphs.cachedGraph(s"copurchase-delta99|$dir", s),
      "the rebuilt merged entry is not cached")
    Graphs.clear(s)
  }

  test("applyDeltaWeighted without a cached weighted graph fails loudly") {
    val s = spark.newSession()
    intercept[IllegalStateException] {
      Graphs.applyDeltaWeighted("wdelta-missing", s,
        Seq((1L, 2L, 1L)).toDF("a", "b", "w"))
    }
  }
}
