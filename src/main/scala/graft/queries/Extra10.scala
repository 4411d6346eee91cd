package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Artifacts, Bfs, Graphs, SimIndexes}

/** Round-17 operators. The reference (/root/reference/task.ts) has no
  * analogue; this is engine surface for the brief's extension menu —
  * the round's theme is SERVING DURABILITY (round-16 verdict: every
  * steady-state `graph_*_idx` / `sim_*_idx` number lived only in a warm
  * JVM):
  *
  *   - the `*_cold` rows run the full durable path INSIDE the
  *     correctness gate: build in the gate's session, save the parquet
  *     artifact, load it into a SEPARATE serving session (one per
  *     SparkContext — the cold stand-in a single-JVM test can produce:
  *     no in-memory state crosses sessions, the artifact is the only
  *     carrier), and serve from the loaded frames with build-counters
  *     provably flat.
  */
object Extra10 {
  type Q = (SparkSession, String) => DataFrame

  /** The serving session — one per SparkContext, memoized so repeated
    * calls (bench sweeps) price steady-state serving from the LOADED
    * artifact rather than re-loading per call (the `_idx` min-of-2
    * discipline; load-vs-rebuild is priced separately by
    * [[graft.ProfileColdLoad]]). `newSession()` shares the context but
    * NOTHING session-scoped: the Graphs/SimIndexes caches key on
    * session identity, so the build session's entries are unreachable
    * from here — any served frame provably came off disk.
    */
  private object ColdServe {
    private val sessions = scala.collection.concurrent.TrieMap
      .empty[org.apache.spark.SparkContext, SparkSession]
    def session(s: SparkSession): SparkSession =
      sessions.getOrElseUpdate(s.sparkContext, s.newSession())
  }

  /** Artifact root for a data directory: tmpdir + the SOURCE CONTENT
    * fingerprint, so a regenerated testdata tree can never serve a
    * stale artifact (new file mtimes/lengths ⇒ new base ⇒ rebuild).
    */
  private def artifactBase(s: SparkSession, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_artifacts/${Artifacts.fingerprint(s, dir)}"

  val queries: Map[String, Q] = Map(
    // -- cold-session graph serving (parquet artifact, fresh session) ----
    // Same operator, same dials, same oracle as graph_bfs — but the
    // graph is SAVED by the build session and LOADED by the serving
    // session, which never sees the builder's cache. The no-build
    // guarantee is structural: the edges thunk passed to the cold
    // lookup THROWS, so if the loaded artifact were missing or keyed
    // differently the query fails loudly instead of quietly rebuilding.
    "graph_bfs_cold" -> { (s, dir) =>
      val base = s"${artifactBase(s, dir)}/graph"
      if (!Artifacts.entries(s, base).exists(_._3 == "graph")) {
        Graphs.index(Extra7.coPurchaseEdgesPlan(s, dir), Extra9.tag(dir), s)
        Graphs.saveAll(s, base)
      }
      val cold = ColdServe.session(s)
      Graphs.loadAll(cold, base)
      val g = Graphs.index(
        sys.error("graph_bfs_cold: cold session tried to BUILD — the " +
          "loaded artifact did not serve"): DataFrame,
        Extra9.tag(dir), cold)
      Bfs.hopDistancesOnAdj(g.adj, Extra7.seedParts(cold, dir),
          maxHops = Extra7.BfsHops)
        .orderBy(col("node"))
    },

    // -- cold-session ANN serving (the sim-family twin) -------------------
    // sim_ann_idx's exact query served from a LOADED LSH artifact in the
    // cold session: rows-only (the sim_ann recall contract — LSH top-k
    // isn't portable SQL), with ColdServeSpec pinning row-identity to
    // the build session's sim_ann_idx output and the build counter flat.
    "sim_ann_cold" -> { (s, dir) =>
      import graft.operators.Ann
      val base = s"${artifactBase(s, dir)}/sim"
      if (!Artifacts.entries(s, base).exists(_._3 == "ann")) {
        SimIndexes.ann(
          ScaleOps.normalized(s, dir).select(col("vec_id"), col("e")),
          s"$dir#raw", planesPerTable = 6)
        SimIndexes.saveAll(s, base)
      }
      val cold = ColdServe.session(s)
      SimIndexes.loadAll(cold, base)
      val n = ScaleOps.normalized(cold, dir)
      val b0 = SimIndexes.builds
      val ix = SimIndexes.ann(n.select(col("vec_id"), col("e")),
        s"$dir#raw", planesPerTable = 6)
      require(SimIndexes.builds == b0,
        "sim_ann_cold: cold session BUILT instead of serving the loaded artifact")
      Ann.lshTopK(n.filter(col("vec_id") < 10), n, k = 5,
          planesPerTable = 6, nprobe = 2, index = Some(ix))
        .localCheckpoint()
        .orderBy(col("qid"), col("rn"))
    }
  )

  val oracle: Map[String, String] = Map(
    // the cold row is oracle-IDENTICAL to graph_bfs: same operator, same
    // dials — only the graph's provenance (parquet artifact in a fresh
    // session vs per-call build) differs, so the driver hash pins the
    // save→load→serve path at full strength
    "graph_bfs_cold" -> Extra7.oracle("graph_bfs")
  )
}
