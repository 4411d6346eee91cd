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
    },

    // -- community quality: modularity over the labelprop communities -----
    // Labelprop emits communities but nothing SCORES them (round-16
    // verdict #5): Newman-Girvan modularity Q = Σ_c (e_c/m − (d_c/2m)²)
    // is the standard community-quality number, and over the cached
    // graph it is pure relational math — one label pass (the exact
    // graph_labelprop iteration, same dials), then per-community: e_c =
    // edges with both endpoints in c (two node-keyed label joins on the
    // cached edge relation), d_c = Σ degree over members (one join on
    // the cached degree table), both map-side-combined aggregates; m is
    // a one-row broadcast. Per-community output (not just the scalar Q)
    // keeps the row set informative AND totally ordered by the unique
    // group key. Float determinism: q is built from exact integers with
    // one division each + one multiply (no pow — IEEE-exact both
    // engines), rounded to 10 (the pagerank rule). An isolated seed
    // (labeled, no edge row) contributes n_nodes with d_tot 0 through
    // the left joins — defined, mirrored in SQL.
    "graph_modularity" -> { (s, dir) =>
      import graft.operators.LabelProp
      val g = Graphs.index(Extra7.coPurchaseEdgesPlan(s, dir),
        Extra9.tag(dir), s)
      val seeds = graft.Tables(s, dir, "part")
        .filter(col("p_size") === 50)
        .select(col("p_partkey").as("v"), col("p_brand").as("label"))
      val labels = LabelProp.propagateOnAdj(g.adj, seeds,
        rounds = Extra7.LpRounds)
      val mRow = g.edges.agg(count(lit(1)).as("m"))
      val ein = g.edges
        .join(labels.select(col("node").as("a"), col("label").as("la")), "a")
        .join(labels.select(col("node").as("b"), col("label").as("lb")), "b")
        .filter(col("la") === col("lb"))
        .select(col("la").as("label"))
        .groupBy(col("label")).agg(count(lit(1)).as("e_in"))
      val dc = labels.join(g.deg, labels("node") === g.deg("v"), "left")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(coalesce(col("d"), lit(0L))).as("d_tot"))
      val dm = col("d_tot").cast("double") / (lit(2.0) * col("m"))
      dc.join(ein, Seq("label"), "left")
        .crossJoin(broadcast(mRow))
        .select(col("label"), col("n_nodes"),
          coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"),
          round(coalesce(col("e_in"), lit(0L)).cast("double") / col("m")
            - dm * dm, 10).as("q"))
        .orderBy(col("label"))
    }
  )

  /** graph_modularity's oracle: the graph_labelprop iteration verbatim
    * (same CTEs, same clamp, same tie-break — the driver hash can only
    * match when the COMMUNITIES match), then the per-community rollup.
    */
  private val modularitySql: String = s"""
      WITH RECURSIVE so AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem
      ), e AS (
        SELECT DISTINCT x.sk AS a, y.sk AS b
        FROM so x JOIN so y ON x.ok = y.ok AND x.sk < y.sk
      ), seed AS (
        SELECT p_partkey AS v, MIN(p_brand) AS label
        FROM part WHERE p_size = 50 GROUP BY p_partkey
      ), adj AS (
        SELECT a AS v, b AS n, CAST(1 AS BIGINT) AS wt FROM e
        UNION ALL SELECT b, a, 1 FROM e
        UNION ALL SELECT v, v, ${graft.operators.LabelProp.ClampWeight} FROM seed
      ), iter(round, v, label) AS (
        SELECT 0, v, label FROM seed
        UNION ALL
        SELECT round + 1, v, label FROM (
          SELECT t.round, t.v, t.label,
                 ROW_NUMBER() OVER (PARTITION BY t.round, t.v
                                    ORDER BY t.wt DESC, t.label ASC) AS rn
          FROM (
            SELECT i.round, a.n AS v, i.label, SUM(a.wt) AS wt
            FROM iter i JOIN adj a ON a.v = i.v
            GROUP BY i.round, a.n, i.label
          ) t
        ) WHERE rn = 1 AND round < ${Extra7.LpRounds}
      ), labels AS (
        SELECT v AS node, label FROM iter WHERE round = ${Extra7.LpRounds}
      ), mm AS (SELECT COUNT(*) AS m FROM e
      ), deg AS (
        SELECT v, COUNT(*) AS d
        FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
      ), ein AS (
        SELECT la.label, COUNT(*) AS e_in
        FROM e JOIN labels la ON e.a = la.node
               JOIN labels lb ON e.b = lb.node
        WHERE la.label = lb.label GROUP BY la.label
      ), dc AS (
        SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(COALESCE(d.d, 0)) AS BIGINT) AS d_tot
        FROM labels l LEFT JOIN deg d ON l.node = d.v GROUP BY l.label
      )
      SELECT dc.label, n_nodes,
             CAST(COALESCE(e_in, 0) AS BIGINT) AS e_in, d_tot,
             ROUND(CAST(COALESCE(e_in, 0) AS DOUBLE) / m
                   - (CAST(d_tot AS DOUBLE) / (2.0 * m))
                     * (CAST(d_tot AS DOUBLE) / (2.0 * m)), 10) AS q
      FROM dc LEFT JOIN ein ON dc.label = ein.label CROSS JOIN mm
      ORDER BY dc.label"""

  val oracle: Map[String, String] = Map(
    // the cold row is oracle-IDENTICAL to graph_bfs: same operator, same
    // dials — only the graph's provenance (parquet artifact in a fresh
    // session vs per-call build) differs, so the driver hash pins the
    // save→load→serve path at full strength
    "graph_bfs_cold" -> Extra7.oracle("graph_bfs"),
    "graph_modularity" -> modularitySql
  )
}
