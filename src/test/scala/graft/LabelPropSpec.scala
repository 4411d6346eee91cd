package graft

import graft.operators.LabelProp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** The graph_labelprop contract, checked against an INDEPENDENT
  * sequential clamped mode-vote (a driver-side map fold — a different
  * formulation than the weighted-self-loop plan, so agreement is
  * evidence): the clamp holds against hostile majorities, ties break
  * deterministically, labels legitimately FLIP as deeper votes arrive,
  * the labeled set grows monotonically, and the real fixture agrees
  * end to end with the registered seed/label rule.
  */
class LabelPropSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(edges: Seq[(Long, Long)], seeds: Seq[(Long, String)],
                  rounds: Int): Map[Long, String] = {
    import spark.implicits._
    LabelProp.propagate(edges.toDF("a", "b"), seeds.toDF("v", "label"), rounds)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  /** Sequential reference: per round, weight-1 votes from labeled
    * neighbours + a ClampWeight self-vote per seed; winner by
    * (weight desc, label asc).
    */
  private def reference(edges: Seq[(Long, Long)], seeds: Seq[(Long, String)],
                        rounds: Int): Map[Long, String] = {
    val adj = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }
    val seed = seeds.groupBy(_._1).map { case (v, ls) => v -> ls.map(_._2).min }
    var cur = seed
    for (_ <- 1 to rounds) {
      val votes = mutable.Map.empty[(Long, String), Long]
      cur.foreach { case (u, l) =>
        adj.getOrElse(u, Nil).foreach { n =>
          votes((n, l)) = votes.getOrElse((n, l), 0L) + 1L
        }
      }
      seed.foreach { case (v, l) =>
        votes((v, l)) = votes.getOrElse((v, l), 0L) + LabelProp.ClampWeight
      }
      cur = votes.toSeq
        .map { case ((v, l), wt) => (v, l, wt) }
        .groupBy(_._1)
        .map { case (v, ls) =>
          v -> ls.minBy { case (_, l, wt) => (-wt, l) }._2
        }
    }
    cur
  }

  test("the clamp holds against a hostile majority — and the seed still converts neighbours") {
    // seed 0 = "a" surrounded by four "b"-seeded neighbours: 0 must
    // keep "a" (the self-vote outweighs 4 votes), while an outer node
    // adjacent only to 0 becomes "a".
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 9L))
    val seeds = Seq((0L, "a"), (1L, "b"), (2L, "b"), (3L, "b"), (4L, "b"))
    val got = run(edges, seeds, rounds = 2)
    assert(got(0L) == "a", s"clamp broke: $got")
    assert(got(9L) == "a", s"seed failed to convert its leaf: $got")
  }

  test("vote ties break to the ascending label on both formulations") {
    // node 2 sees exactly one "a" and one "b" neighbour
    val edges = Seq((0L, 2L), (1L, 2L))
    val seeds = Seq((0L, "b"), (1L, "a"))
    val got = run(edges, seeds, rounds = 1)
    assert(got(2L) == "a")
    assert(got === reference(edges, seeds, 1))
  }

  test("a non-seed label legitimately flips as deeper votes arrive") {
    // x(1) adjacent to a-seed 0 and to 2,3; 2,3 sit next to b-seeds:
    // round 1 labels x "a" (only labeled neighbour), round 2 flips it
    // "b" (2 votes to 1)
    val edges = Seq((0L, 1L), (1L, 2L), (1L, 3L), (2L, 10L), (3L, 11L))
    val seeds = Seq((0L, "a"), (10L, "b"), (11L, "b"))
    assert(run(edges, seeds, rounds = 1)(1L) == "a")
    assert(run(edges, seeds, rounds = 2)(1L) == "b")
  }

  test("duplicate seed rows resolve to min(label); rounds = 0 returns the seed set") {
    val got = run(Seq((1L, 2L)), Seq((1L, "z"), (1L, "a")), rounds = 0)
    assert(got === Map(1L -> "a"))
  }

  test("seeded random graph agrees with the reference and the labeled set grows monotonically") {
    val rnd = new scala.util.Random(20260815L)
    val n = 250
    val edges = Seq.fill(700)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val seeds = Seq.tabulate(8)(i => (rnd.nextInt(n).toLong, s"c$i")).distinctBy(_._1)
    var prev = Set.empty[Long]
    for (rounds <- 0 to 4) {
      val got = run(edges, seeds, rounds)
      assert(got === reference(edges, seeds, rounds), s"mismatch at rounds=$rounds")
      assert(prev.subsetOf(got.keySet),
        s"labeled set shrank at rounds=$rounds")
      prev = got.keySet
    }
  }

  test("real sf0.001 graph with the registered seed/label rule agrees with the reference") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"$dir missing")
    val so = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk"))
      .distinct()
    val e = so.alias("x")
      .join(so.alias("y"),
        col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("a"), col("y.sk").as("b"))
      .distinct()
    val seeds = spark.read.parquet(s"$dir/part.parquet")
      .filter(col("p_size") === 50)
      .select(col("p_partkey").as("v"), col("p_brand").as("label"))
    val edgePairs = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val seedPairs = seeds.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(seedPairs.nonEmpty, "fixture has no p_size=50 parts — vacuous")
    val got = LabelProp.propagate(e, seeds, rounds = queries.Extra7.LpRounds)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = reference(edgePairs, seedPairs, queries.Extra7.LpRounds)
    assert(got === want)
    // the fixture must genuinely exercise the vote: more than one
    // surviving label class, and non-seed nodes labeled
    assert(got.values.toSet.size > 1, "diffusion collapsed to one label")
    assert(got.keySet.size > seedPairs.size, "no non-seed node was labeled")
  }

  test("modularity: a planted two-clique graph scores near the known optimum") {
    // two K4s bridged by one edge: m = 13; each community (after
    // propagation from one seed per clique) holds its whole K4, so
    // e_c = 6 and d_c = 4·3 + 1 (the bridge endpoint's extra degree)
    // = 13 → q_c = 6/13 − (13/26)² = 0.2115384615, Q = 2·q_c ≈ 0.423 —
    // the textbook near-optimum for this geometry (hand-derived, not
    // fit to the implementation).
    import spark.implicits._
    import graft.operators.Graphs
    val k4a = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    val k4b = Seq((5L,6L),(5L,7L),(5L,8L),(6L,7L),(6L,8L),(7L,8L))
    val edges = k4a ++ k4b ++ Seq((4L,5L))
    val s = spark.newSession()
    val g = Graphs.index(edges.toDF("a","b"), "mod-clique", s)
    val labels = LabelProp.propagateOnAdj(g.adj,
      Seq((1L,"L"),(8L,"R")).toDF("v","label"), rounds = 3)
    val mRow = g.edges.agg(count(lit(1)).as("m"))
    val ein = g.edges
      .join(labels.select(col("node").as("a"), col("label").as("la")), "a")
      .join(labels.select(col("node").as("b"), col("label").as("lb")), "b")
      .filter(col("la") === col("lb"))
      .select(col("la").as("label"))
      .groupBy(col("label")).agg(count(lit(1)).as("e_in"))
    val dc = labels.join(g.deg, labels("node") === g.deg("v"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(coalesce(col("d"), lit(0L))).as("d_tot"))
    val dm = col("d_tot").cast("double") / (lit(2.0) * col("m"))
    val q = dc.join(ein, Seq("label"), "left")
      .crossJoin(broadcast(mRow))
      .select(col("label"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"),
        round(coalesce(col("e_in"), lit(0L)).cast("double") / col("m")
          - dm * dm, 10).as("q"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(q.keySet === Set("L", "R"))
    for ((_, (n, ein2, dtot, qc)) <- q) {
      assert(n === 4L); assert(ein2 === 6L); assert(dtot === 13L)
      assert(math.abs(qc - 0.2115384615) < 1e-9)
    }
    assert(math.abs(q.values.map(_._4).sum - 0.4230769231) < 1e-8)
    Graphs.clear(s)
  }
}
