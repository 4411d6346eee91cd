package graft

import graft.operators.Triangles
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The orientation claims the graph_triangles scaladoc makes, as code:
  * per-node counts are orientation-independent (any total order
  * enumerates each triangle exactly once), and degree-ordering is the
  * skew lever (it strictly shrinks the wedge mass exactly where
  * id-order explodes it — a low-id hub).
  */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Adversarial-for-id-order fixture: node 0 is a hub (lowest id,
    * highest degree) wired to spokes 1..40; consecutive spokes are
    * wired, so triangles are exactly (0, i, i+1) for i in 1..39 — the
    * hub participates in ALL 39, each spoke in at most 2. Plus an
    * isolated triangle (100, 101, 102) away from the hub.
    */
  private def hubEdges = {
    import spark.implicits._
    val star = (1L to 40L).map(i => (0L, i))
    val rim = (1L to 39L).map(i => (i, i + 1))
    val iso = Seq((100L, 101L), (100L, 102L), (101L, 102L))
    (star ++ rim ++ iso).toDF("a", "b")
  }

  private def counts(e: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Triangles.perNodeCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("per-node counts are orientation-independent (id vs degree order)") {
    val idOrder = hubEdges
    val degOrder = Triangles.orientByDegree(hubEdges)
    val byId = counts(idOrder)
    val byDeg = counts(degOrder)
    // ground truth by construction
    assert(byId(0L) == 39L, s"hub should be in 39 triangles: $byId")
    assert(byId(1L) == 1L && byId(20L) == 2L && byId(40L) == 1L)
    assert(byId(100L) == 1L && byId(101L) == 1L && byId(102L) == 1L)
    assert(byDeg === byId,
      "degree orientation changed the counts — it must only change the plan")
  }

  test("degree orientation strictly shrinks the wedge mass on a hub graph") {
    // id-order gives the low-id hub out-degree 40 → it alone contributes
    // 1600 to Σ outdeg²; degree-order points every star edge AT the hub
    // (highest degree), so the hub's out-degree drops to 0 and the mass
    // collapses to the rim/iso edges' small fan-outs. This is the
    // O(√m)-out-degree bound (Schank & Wagner) made measurable.
    val before = Triangles.wedgeMass(hubEdges)
    val after = Triangles.wedgeMass(Triangles.orientByDegree(hubEdges))
    info(s"wedge mass: id-order $before, degree-order $after")
    assert(before >= 1600L, s"fixture lost its hub: $before")
    assert(after * 4 < before,
      s"degree orientation must collapse the hub's wedge mass: $before -> $after")
  }

  test("bloom-pruned enumeration equals the unpruned per-node counts (round-19)") {
    // The wedge prune has no false negatives (Bloom) and the closing
    // equi join verifies every surviving candidate, so the counts must
    // be IDENTICAL — on both orientations, and regardless of the
    // expectedEdges sizing (an undersized filter only raises fpp).
    val byId = counts(hubEdges)
    def pruned(e: org.apache.spark.sql.DataFrame, n: Long): Map[Long, Long] =
      Triangles.perNodeCountsPruned(e, n).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pruned(hubEdges, hubEdges.count()) === byId)
    assert(pruned(Triangles.orientByDegree(hubEdges), 1L) === byId,
      "undersized filter changed results — fpp must only cost bytes")
    // above the broadcast ceiling the prune must fall back, not build
    // a filter that cannot broadcast
    assert(pruned(hubEdges, Triangles.BloomPruneMaxEdges + 1L) === byId)
  }

  test("bloom prune drops non-closing wedges before the closing join (row budget)") {
    // On the fixture some wedges do not close (e.g. (0, i, i+1) wedges
    // close but (i−1, i, i+1) rim wedges mostly don't) — the prune must
    // keep the enumeration exact while having real rows to drop.
    val wedgesAll = hubEdges.alias("e1")
      .join(hubEdges.alias("e2"), col("e1.b") === col("e2.a")).count()
    val survivors = Triangles
      .triangleRowsPruned(hubEdges, hubEdges.count(), fpp = 0.01)
    assert(wedgesAll > 40L, s"fixture has no non-closing wedges: $wedgesAll")
    // 39 hub triangles (0, i, i+1) + the isolated (100, 101, 102)
    assert(survivors.count() == 40L, "triangle multiset changed under the prune")
  }

  test("orientByDegree emits each edge exactly once, as a valid orientation") {
    val e = Triangles.orientByDegree(hubEdges)
    assert(e.count() == hubEdges.count(), "edge multiplicity changed")
    // undirected identity preserved: same canonical (min, max) multiset
    val canon = (d: org.apache.spark.sql.DataFrame) => d
      .select(least(col("a"), col("b")).as("x"), greatest(col("a"), col("b")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(canon(e) === canon(hubEdges))
  }
}
