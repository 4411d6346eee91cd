package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Fixed-point PageRank operator (round 13): convergence early-exit,
  * dangling-mass correctness on non-symmetric graphs, and mass
  * conservation — the generality the `graph_pagerank` query deliberately
  * sidesteps by construction (symmetric co-order graph, fixed rounds).
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference power iteration with the operator's exact semantics
    * (uniform init, dangling redistribution, 1e-10 HALF_UP snap per
    * round, stop at the snapped fixed point).
    */
  private def ref(edges: Seq[(Long, Long)], d: Double,
                  maxIters: Int): (Map[Long, Double], Int) = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    def snap(x: Double) =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    var pr = nodes.map(_ -> snap(1.0 / n)).toMap
    var (r, converged) = (0, false)
    while (!converged && r < maxIters) {
      val dangling = nodes.filterNot(out.contains).map(pr).sum
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => pr(e._1) / out(e._1)).sum
      }
      val next = nodes.map(v => v -> snap(
        (1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
      converged = next == pr
      pr = next
      r += 1
    }
    (pr, r)
  }

  private def run(edges: Seq[(Long, Long)], maxIters: Int = 60): Map[Long, Double] = {
    import spark.implicits._
    PageRank.ranks(edges.toDF("src", "dst"), maxIterations = maxIters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("dangling graph: mass conserved, matches the reference iteration") {
    // 2 is a pure sink (no out-edges), 4 is dst-only: both rank-holding,
    // the exact shapes the query's symmetric graph never exercises.
    val e = Seq((1L, 2L), (3L, 1L), (1L, 4L), (4L, 2L), (3L, 4L))
    val got = run(e)
    val (want, _) = ref(e, 0.85, 60)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, p) =>
      assert(math.abs(p - want(v)) <= 1e-9, s"node $v: got $p want ${want(v)}")
    }
    // dangling redistribution conserves mass (without the term, the sink
    // node 2 leaks ~its whole rank every round)
    assert(math.abs(got.values.sum - 1.0) <= got.size * 1e-9,
      s"rank mass not conserved: ${got.values.sum}")
  }

  test("convergence digest stops early at the snapped fixed point") {
    // small symmetric triangle + pendant: converges in far fewer than 60
    // rounds on the 1e-10 grid; one more reference round past the stop
    // must change nothing (it IS the fixed point, not a near-miss).
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L),
      (3L, 4L), (4L, 3L))
    val got = run(e, maxIters = 60)
    assert(PageRank.lastRounds < 60,
      s"no early exit: ran ${PageRank.lastRounds} rounds")
    val (want, refRounds) = ref(e, 0.85, 60)
    assert(refRounds < 60)
    got.foreach { case (v, p) =>
      assert(math.abs(p - want(v)) <= 1e-9, s"node $v: got $p want ${want(v)}")
    }
  }

  test("maxIterations caps a slow spectrum without converging") {
    // two-node cycle alternates rank parity slowly toward 0.5/0.5; with
    // maxIterations=1 the operator must do exactly one round and stop.
    val e = Seq((1L, 2L), (2L, 1L))
    val got = run(e, maxIters = 1)
    assert(PageRank.lastRounds == 1)
    assert(got.size == 2)
  }
}
