package graft

import graft.operators.{Graphs, Triangles}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graph family's materialize-once seam (round-15 verdict #1): the
  * `graph_*_idx` rows must be ROW-IDENTICAL to their build-included
  * siblings and must reuse the session-cached graph instead of
  * rebuilding — the SimIndexes spec discipline applied to
  * [[graft.operators.Graphs]].
  */
class GraphsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("steady-state graph_*_idx queries equal their build-included siblings and reuse the graph") {
    def rowsIn(s: SparkSession, q: String): Seq[org.apache.spark.sql.Row] =
      SparkEntry.queries(q)(s, sf).collect().toSeq
    def rows(q: String): Seq[org.apache.spark.sql.Row] = rowsIn(spark, q)
    Graphs.clear(spark)
    val siblings = Seq(
      "graph_triangles" -> "graph_triangles_idx",
      "graph_kcore" -> "graph_kcore_idx",
      "graph_bfs" -> "graph_bfs_idx",
      "graph_sssp" -> "graph_sssp_idx",
      "graph_labelprop" -> "graph_labelprop_idx",
      "graph_linkpred" -> "graph_linkpred_idx",
      "graph_ppr" -> "graph_ppr_idx")
    for ((build, steady) <- siblings) {
      val expected = rows(build)
      val before = Graphs.builds
      val first = rows(steady)
      val second = rows(steady)
      // memo → artifact → build (round-17 verdict #2): the FIRST steady
      // call of each kind installs the shared graph — by building on a
      // true cold start, or with builds FLAT when a committed artifact
      // from a previous run serves it off disk; either way never more
      // than one install per kind, and never a rebuild on the second call
      assert(Graphs.builds <= before + 1,
        s"$steady: repeated calls must reuse the cached graph, not rebuild")
      assert(first === expected, s"$steady diverged from $build")
      assert(second === first, s"$steady unstable across cached calls")
    }
    // whichever path the loop took, both graph kinds are now COMMITTED
    // artifacts (a build saves back) — so a brand-new session must
    // serve every row off disk with builds flat: the new default path
    val base = s"${graft.operators.Artifacts.defaultBase(spark, sf)}/graph"
    val kinds = graft.operators.Artifacts.entries(spark, base).map(_._3).toSet
    assert(Set("graph", "wgraph").subsetOf(kinds),
      s"expected both graph kinds committed under $base, got $kinds")
    val sB = spark.newSession()
    val b0 = Graphs.builds
    for ((build, steady) <- siblings)
      assert(rowsIn(sB, steady) === rows(build),
        s"$steady diverged when artifact-served in a fresh session")
    assert(Graphs.builds == b0,
      "fresh session BUILT instead of serving the committed artifact")
    Graphs.clear(sB)
    Graphs.clear(spark)
  }

  test("cached orientation equals the operator's own degree orientation") {
    // Graphs.index derives `oriented` from the PERSISTED degree table
    // instead of re-counting inside Triangles.orientByDegree — same
    // total order, so the edge SETS must match exactly.
    Graphs.clear(spark)
    import spark.implicits._
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (1L, 5L), (1L, 4L))
      .toDF("a", "b")
    val g = Graphs.index(e, "spec-orient", spark)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asSet(g.oriented) === asSet(Triangles.orientByDegree(e)))
    // degree table matches a direct count over the symmetrized adjacency
    val deg = g.deg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg === Map(1L -> 4L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
    Graphs.clear(spark)
  }

  test("clear() drops a session's entries so the next call rebuilds") {
    Graphs.clear(spark)
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("a", "b")
    val before = Graphs.builds
    Graphs.index(e, "spec-clear", spark)
    assert(Graphs.builds == before + 1)
    Graphs.index(e, "spec-clear", spark)
    assert(Graphs.builds == before + 1, "same tag must not rebuild")
    Graphs.clear(spark)
    Graphs.index(e, "spec-clear", spark)
    assert(Graphs.builds == before + 2, "clear() must force a rebuild")
    Graphs.clear(spark)
  }
}
