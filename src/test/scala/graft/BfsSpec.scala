package graft

import graft.operators.Bfs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** The graph_bfs contract, checked against an INDEPENDENT sequential
  * BFS (a driver-side queue walk — a different formulation than the
  * level-set min-over-levels plan, so agreement is evidence, not
  * tautology): known structures where the distances are derivable by
  * hand, a seeded random graph, and the real sf0.001 co-purchase
  * fixture with the registered seed rule.
  */
class BfsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("a", "b")
  }

  private def seedDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("v")
  }

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  maxHops: Int): Map[Long, Long] =
    Bfs.hopDistances(df(edges), seedDf(seeds), maxHops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: textbook sequential multi-source BFS over an adjacency
    * map, truncated at maxHops.
    */
  private def reference(edges: Seq[(Long, Long)], seeds: Seq[Long],
                        maxHops: Int): Map[Long, Long] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val dist = mutable.Map.empty[Long, Long]
    var frontier = seeds.distinct.toSet
    frontier.foreach(dist(_) = 0L)
    var h = 0L
    while (h < maxHops && frontier.nonEmpty) {
      h += 1
      frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = h)
    }
    dist.toMap
  }

  test("path graph: hop budget truncates exactly") {
    // 1-2-3-4-5-6: from seed 1 with maxHops 3, node 5 (dist 4) and 6
    // must NOT appear.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val got = run(path, Seq(1L), maxHops = 3)
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("multi-source takes the minimum over seeds; cycles don't inflate distances") {
    // 6-cycle with seeds at opposite corners: every node within 1 hop
    // of the NEAREST seed, revisits along the cycle must not raise it.
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L))
    val got = run(cycle, Seq(0L, 3L), maxHops = 3)
    assert(got === Map(0L -> 0L, 3L -> 0L, 1L -> 1L, 2L -> 1L,
      4L -> 1L, 5L -> 1L))
  }

  test("a seed outside the edge relation appears at distance 0; disconnected components stay unreached") {
    val twoIslands = Seq((1L, 2L), (10L, 11L))
    val got = run(twoIslands, Seq(1L, 99L), maxHops = 3)
    assert(got === Map(99L -> 0L, 1L -> 0L, 2L -> 1L),
      "the 10-11 island has no seed and must emit no rows")
  }

  test("maxHops = 0 returns only the seed set") {
    val got = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 3L), maxHops = 0)
    assert(got === Map(1L -> 0L, 3L -> 0L))
  }

  test("seeded random graph agrees with the sequential reference") {
    val rnd = new scala.util.Random(20260816L)
    val n = 300
    val edges = Seq.fill(900)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val seeds = Seq.fill(5)(rnd.nextInt(n).toLong).distinct
    for (hops <- Seq(1, 2, 4)) {
      val got = run(edges, seeds, hops)
      val want = reference(edges, seeds, hops)
      assert(got === want, s"mismatch at maxHops=$hops")
    }
  }

  // ---- weightedDistances (bounded Bellman-Ford) ----------------------------

  private def wdf(edges: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    edges.toDF("a", "b", "w")
  }

  private def runW(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                   rounds: Int): Map[Long, Long] =
    Bfs.weightedDistances(wdf(edges), seedDf(seeds), rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: textbook Bellman-Ford truncated at `rounds` relaxations. */
  private def referenceW(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                         rounds: Int): Map[Long, Long] = {
    val adj = mutable.Map.empty[Long, mutable.ArrayBuffer[(Long, Long)]]
    edges.foreach { case (a, b, w) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += ((b, w))
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += ((a, w))
    }
    var dist: Map[Long, Long] = seeds.distinct.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val next = mutable.Map.empty[Long, Long]
      dist.foreach { case (v, d) =>
        def relax(n: Long, nd: Long): Unit =
          if (!next.contains(n) || next(n) > nd) next(n) = nd
        relax(v, d) // the keep-term (the operator's weight-0 self-loop)
        adj.getOrElse(v, mutable.ArrayBuffer.empty)
          .foreach { case (n, w) => relax(n, d + w) }
      }
      dist = next.toMap
    }
    dist
  }

  test("a cheap long route overtakes an expensive direct edge — the weighted/hop distinction") {
    // 1-3 direct costs 10; 1-2-3 costs 1+1=2. One round must report 10
    // (the relax hasn't reached through 2); two rounds must report 2.
    val g = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L))
    assert(runW(g, Seq(1L), rounds = 1) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    assert(runW(g, Seq(1L), rounds = 2) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("weighted multi-source takes the cheapest seed; zero-weight edges are legal") {
    val g = Seq((0L, 1L, 3L), (1L, 2L, 0L), (2L, 3L, 3L))
    val got = runW(g, Seq(0L, 3L), rounds = 3)
    assert(got === Map(0L -> 0L, 3L -> 0L, 1L -> 3L, 2L -> 3L))
  }

  test("weighted: a seed outside the edge relation keeps distance 0 through every round") {
    val got = runW(Seq((1L, 2L, 5L)), Seq(1L, 99L), rounds = 3)
    assert(got === Map(99L -> 0L, 1L -> 0L, 2L -> 5L))
  }

  test("weighted seeded random graph agrees with the sequential Bellman-Ford") {
    val rnd = new scala.util.Random(15082026L)
    val n = 200
    val edges = Seq.fill(600)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
      .map { case (a, b) => (a, b, (rnd.nextInt(7) + 1).toLong) }
    val seeds = Seq.fill(4)(rnd.nextInt(n).toLong).distinct
    for (rounds <- Seq(1, 2, 4)) {
      val got = runW(edges, seeds, rounds)
      val want = referenceW(edges, seeds, rounds)
      assert(got === want, s"mismatch at rounds=$rounds")
    }
  }

  test("weighted real sf0.001 graph with the registered weight rule agrees with the reference") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"$dir missing")
    val so = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk"))
      .distinct()
    val e = so.alias("x")
      .join(so.alias("y"),
        col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .groupBy(col("x.sk").as("a"), col("y.sk").as("b"))
      .agg(count(lit(1)).as("co"))
      .select(col("a"), col("b"), (lit(8L) - least(col("co"), lit(7L))).as("w"))
    val seeds = spark.read.parquet(s"$dir/part.parquet")
      .filter(col("p_size") === 50)
      .select(col("p_partkey").as("v"))
    val edgeTriples = e.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val seedIds = seeds.collect().map(_.getLong(0)).toSeq
    val got = Bfs.weightedDistances(e, seeds, rounds = queries.Extra7.SsspRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = referenceW(edgeTriples, seedIds, queries.Extra7.SsspRounds)
    assert(got === want)
    // the weighted metric must genuinely differ from the hop metric on
    // this fixture (else the query is BFS in disguise)
    val hops = Bfs.hopDistances(
        e.select(col("a"), col("b")), seeds, maxHops = queries.Extra7.SsspRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.exists { case (v, d) => hops.get(v).exists(h => d != h) },
      "weighted distances identical to hop distances — weight rule degenerate")
  }

  test("real sf0.001 co-purchase graph with the registered seed rule agrees with the reference") {
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
      .select(col("p_partkey").as("v"))
    val edgePairs = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val seedIds = seeds.collect().map(_.getLong(0)).toSeq
    assert(seedIds.nonEmpty, "fixture has no p_size=50 parts — vacuous")
    val got = Bfs.hopDistances(e, seeds, maxHops = queries.Extra7.BfsHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = reference(edgePairs, seedIds, queries.Extra7.BfsHops)
    assert(got.size === want.size)
    assert(got === want)
    // the fixture must actually exercise the expansion: at least two
    // distinct non-zero distances, else the hop budget is untested
    assert(got.values.toSet.count(_ > 0L) >= 2,
      s"distance spectrum degenerate: ${got.values.toSet}")
  }
}
