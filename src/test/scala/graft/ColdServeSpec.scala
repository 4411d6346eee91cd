package graft

import graft.operators.{Artifacts, Graphs, SimIndexes}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The durable serving seam (round-16 verdict #1): every steady-state
  * `graph_*_idx` / `sim_*_idx` row must be servable from a COLD session
  * — build in session A, persist the parquet artifact, serve in a
  * session that shares NOTHING with A but the artifact, row-identical,
  * with the build counters provably flat. `newSession()` is the
  * in-JVM stand-in for a restarted driver: the caches key on session
  * identity, so B cannot reach A's entries — the artifact is the only
  * possible carrier (the parquet round-trip itself is what a real
  * restart would replay).
  */
class ColdServeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def rows(q: String, s: SparkSession): Seq[org.apache.spark.sql.Row] =
    SparkEntry.queries(q)(s, sf).collect().toSeq

  test("graph artifact: build in A, save, serve all 7 idx rows cold in B, builds flat") {
    val base = tmp("graft_cold_graph")
    val idx = Seq("graph_triangles_idx", "graph_kcore_idx", "graph_bfs_idx",
      "graph_sssp_idx", "graph_labelprop_idx", "graph_linkpred_idx",
      "graph_ppr_idx")
    val sA = spark.newSession()
    val expected = idx.map(q => q -> rows(q, sA)).toMap
    val saved = Graphs.saveAll(sA, base)
    assert(saved >= 2, s"expected both graph kinds saved, got $saved")
    Graphs.clear(sA) // session A is gone; the artifact is the only carrier

    val sB = spark.newSession()
    val loaded = Graphs.loadAll(sB, base)
    assert(loaded == saved, s"loadAll installed $loaded of $saved")
    val b0 = Graphs.builds
    for (q <- idx)
      assert(rows(q, sB) === expected(q), s"$q diverged when served cold")
    assert(Graphs.builds == b0,
      "cold session BUILT instead of serving the loaded artifact")
    Graphs.clear(sB)
  }

  test("loaded graph artifact serves without ever evaluating the edges plan") {
    val base = tmp("graft_cold_thunk")
    import spark.implicits._
    val sA = spark.newSession()
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val gA = Graphs.index(e, "spec-cold", sA)
    val expected = gA.deg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Graphs.saveAll(sA, base)
    Graphs.clear(sA)

    val sB = spark.newSession()
    Graphs.loadAll(sB, base)
    // the edges thunk THROWS: a cache miss would fail loudly, so a pass
    // proves the frames came off disk
    val gB = Graphs.index(
      sys.error("must not build"): DataFrame, "spec-cold", sB)
    assert(gB.deg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === expected)
    // the frame-tag rule: a DIFFERENT tag is a miss, never a wrong graph
    intercept[RuntimeException] {
      Graphs.index(sys.error("miss"): DataFrame, "spec-cold-other", sB)
    }
    Graphs.clear(sB)
  }

  test("sim artifact: build in A, save, serve all 4 idx rows cold in B, builds flat") {
    val base = tmp("graft_cold_sim")
    val idx = Seq("sim_ann_idx", "sim_ivf_idx", "sim_pq_idx", "sim_ivf_pq_idx")
    val sA = spark.newSession()
    val expected = idx.map(q => q -> rows(q, sA)).toMap
    val saved = SimIndexes.saveAll(sA, base)
    // 4 or 5 entries: ann#raw, ivf#raw, pq#unit, ivfpq#unit — plus a
    // nested ivf#unit only when ivfPq BUILT in this session (the build
    // path populates ivf()'s cache; an artifact-served ivfpq reloads
    // the finished triple and never touches the nested entry)
    assert(saved >= 4, s"expected the 4 sim index kinds saved, got $saved")
    SimIndexes.clear(sA)

    val sB = spark.newSession()
    val loaded = SimIndexes.loadAll(sB, base)
    assert(loaded == saved, s"loadAll installed $loaded of $saved")
    val b0 = SimIndexes.builds
    for (q <- idx)
      assert(rows(q, sB) === expected(q), s"$q diverged when served cold")
    assert(SimIndexes.builds == b0,
      "cold session BUILT instead of serving the loaded artifact")
    SimIndexes.clear(sB)
  }

  test("registered cold rows equal their warm siblings") {
    assert(rows("graph_bfs_cold", spark) === rows("graph_bfs", spark),
      "graph_bfs_cold diverged from graph_bfs")
    assert(rows("sim_ann_cold", spark) === rows("sim_ann_idx", spark),
      "sim_ann_cold diverged from sim_ann_idx")
    Graphs.clear(spark)
    SimIndexes.clear(spark)
  }

  test("artifact lifecycle: unchanged entries skip the rewrite, mutations rewrite, crashed dirs prune, stale bases age out") {
    import spark.implicits._
    val base = tmp("graft_lifecycle")
    val sA = spark.newSession()
    Graphs.index(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "spec-life", sA)
    assert(Graphs.saveAll(sA, base) == 1)
    def mtimes(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(base)).map(f => f.getPath -> f.lastModified).toMap
    }
    val m1 = mtimes()
    // skip-unchanged (r17 verdict #4): a second saveAll counts the entry
    // but rewrites NOTHING — every file mtime is stable
    assert(Graphs.saveAll(sA, base) == 1, "skipped entry must still count")
    assert(mtimes() === m1, "unchanged entry was rewritten")
    // a mutation bumps the rev, so the next save DOES rewrite
    Graphs.applyDelta("spec-life", sA, Seq((3L, 4L)).toDF("a", "b"))
    assert(Graphs.saveAll(sA, base) == 1)
    assert(mtimes() !== m1, "mutated entry was not rewritten")
    // and the rewritten artifact round-trips the merged graph
    val sB = spark.newSession()
    Graphs.loadAll(sB, base)
    val g = Graphs.index(sys.error("must serve"): org.apache.spark.sql.DataFrame,
      "spec-life", sB)
    assert(g.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L), (2L, 3L), (3L, 4L)))
    // crashed (manifest-less) save dirs prune away
    Seq((9L, 9L)).toDF("a", "b").write.parquet(s"$base/deadbeef/edges")
    assert(Artifacts.pruneUncommitted(spark, base) == 1)
    assert(!new java.io.File(s"$base/deadbeef").exists(),
      "crashed save dir survived pruneUncommitted")
    assert(Artifacts.pruneUncommitted(spark, base) == 0)
    // stale BASES age out of the shared root: plant three ancient fake
    // bases, keep as many as the root currently holds — exactly the
    // three oldest (the fakes) go, every real base survives
    val root = new java.io.File(Artifacts.root)
    root.mkdirs()
    val before = root.listFiles().count(_.isDirectory)
    val fakes = (1 to 3).map { i =>
      val d = new java.io.File(root, s"stale_spec_$i")
      d.mkdirs(); d.setLastModified(1000L * i); d
    }
    assert(Artifacts.pruneBases(spark, keep = before) == 3)
    assert(fakes.forall(!_.exists()), "stale bases survived pruneBases")
    Graphs.clear(sB)
    Graphs.clear(sA)
  }

  test("a save that never wrote its manifest is invisible") {
    val base = tmp("graft_cold_uncommitted")
    import spark.implicits._
    // component frames present, no manifest — a crashed save
    Seq((1L, 2L)).toDF("a", "b")
      .write.parquet(s"$base/deadbeef/edges")
    assert(Artifacts.entries(spark, base).isEmpty)
    assert(Graphs.loadAll(spark, base) == 0)
  }
}
