package graft

import graft.operators.KCore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.KCore]] against an independent reference: the
  * classic sequential min-degree peel, implemented here in plain Scala
  * (no shared code with the operator — the operator iterates h-indexes,
  * the reference literally removes min-degree nodes), so agreement is
  * two different algorithms reaching the same decomposition.
  */
class KCoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference: peel nodes in min-degree order; a node's core is the
    * degree floor in force when it is removed (Batagelj–Zaveršnik).
    */
  private def referenceCores(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
    }
    val core = scala.collection.mutable.Map[Long, Long]()
    var k = 0L
    while (adj.nonEmpty) {
      val minDeg = adj.valuesIterator.map(_.size).min
      k = math.max(k, minDeg.toLong)
      // remove EVERY node at degree <= k before k can rise (a removal
      // may drop a neighbour's degree below the current floor)
      var peeled = true
      while (peeled) {
        adj.find(_._2.size <= k) match {
          case Some((v, ns)) =>
            core(v) = k
            ns.foreach { u => adj.get(u).foreach(_ -= v) }
            adj -= v
          case None => peeled = false
        }
      }
    }
    core.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    KCore.coreNumbers(edges.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("known structures: cliques, cycles, trees, pendants") {
    // K5 (core 4) bridged to a C4 (core 2) with a pendant path (core 1)
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c4 = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val bridge = Seq((4L, 10L))
    val path = Seq((13L, 20L), (20L, 21L))
    val edges = k5 ++ c4 ++ bridge ++ path
    val got = run(edges)
    assert((0L to 4L).forall(got(_) == 4L), s"K5 members must be 4-core: $got")
    assert((10L to 13L).forall(got(_) == 2L), s"C4 members must be 2-core: $got")
    assert(got(20L) == 1L && got(21L) == 1L, s"path nodes must be 1-core: $got")
    assert(got === referenceCores(edges))
  }

  test("matches the sequential peel on a seeded random graph") {
    val rnd = new scala.util.Random(7L)
    val n = 120
    // mixed density: a dense kernel + sparse fringe, so core values spread
    val edges = (for (_ <- 1 to 900) yield {
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(if (a < 30) 30 else n).toLong
      if (a < b) (a, b) else (b, a)
    }).distinct.filter(e => e._1 != e._2)
    val got = run(edges)
    val want = referenceCores(edges)
    assert(got === want)
    // the h-index iteration starts AT the degree and strictly shrinks to
    // the core — spot the bound held
    assert(got.values.max >= 2)
  }

  test("the real co-purchase fixture at sf0.001 agrees with the peel") {
    val so = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk")).distinct()
    val e = so.alias("x")
      .join(so.alias("y"), col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("a"), col("y.sk").as("b")).distinct()
    val edges = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = KCore.coreNumbers(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceCores(edges))
    assert(got.nonEmpty)
  }

  test("coreEstimate (the bounded query form) refines monotonically onto coreNumbers") {
    import spark.implicits._
    // the K5+C4+path fixture converges well within 8 steps, so the
    // registered 8-step contract equals the true cores here; and each
    // added step can only LOWER an estimate (h-index monotonicity)
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c4 = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val edges = (k5 ++ c4 ++ Seq((4L, 10L), (13L, 20L), (20L, 21L))).toDF("a", "b")
    def est(steps: Int): Map[Long, Long] =
      KCore.coreEstimate(edges, steps).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = KCore.coreNumbers(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e8 = est(queries.Extra7.KCoreSteps)
    assert(e8 === exact, "8 steps must reach the fixed point on this fixture")
    val e1 = est(1)
    val e3 = est(3)
    assert(e1.keySet === e3.keySet && e3.keySet === e8.keySet)
    assert(e3.forall { case (v, c) => c <= e1(v) && c >= e8(v) },
      "estimates must decrease monotonically in steps toward the core")
  }

  test("the iteration cap fails loudly instead of truncating") {
    import spark.implicits._
    // a path needs ~length/2 rounds (the 1-core estimate walks inward
    // one hop per round); one round is provably not enough at length 8
    val edges = (0L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      KCore.coreNumbers(edges, maxIterations = 1)
    }
    assert(ex.getMessage.contains("maxIterations"))
  }
}
