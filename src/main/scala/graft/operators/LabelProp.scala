package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over an undirected edge relation:
  * the operator behind `graph_labelprop` (graft.queries.Extra7;
  * reference /root/reference/task.ts has no analogue — engine
  * graph-analytics surface, the sixth graph discipline next to
  * numeric label propagation (CC/PageRank), enumeration (Triangles),
  * the k-core peel, and BFS/SSSP traversal: CATEGORICAL diffusion,
  * where per-round state is a label column and the update is a mode
  * vote, not an arithmetic fold).
  *
  * Algorithm (Zhu & Ghahramani 2002 / Raghavan et al. 2007, the
  * semi-supervised clamped form): seed nodes carry fixed labels; each
  * round every node with at least one labeled neighbour adopts its
  * neighbours' MODE label, ties broken deterministically by (weight
  * DESC, label ASC) — the determinism that makes the bounded iteration
  * cross-engine checkable (free-running LPA's random tie-breaks are
  * exactly what an oracle cannot mirror).
  *
  * The CLAMP is folded into the vote instead of joined on afterwards:
  * each seed gets a self-loop of weight [[ClampWeight]] (10⁹ — beyond
  * any realistic degree), so a seed's own label outvotes every
  * neighbourhood and its row never drifts, while the per-round plan
  * stays ONE edge join + ONE map-side-combined (node, label) weight
  * sum + ONE window rank — the state is referenced exactly once per
  * round (the kcore h(x)-once discipline), so `rounds` rounds chain
  * into a single depth-linear lazy plan, and the oracle can mirror it
  * in a recursive CTE that references the iteration exactly once (the
  * clamp-as-join alternative needs a second reference, which recursive
  * CTEs forbid).
  *
  * The labeled set grows monotonically (L_h = seeds ∪ N(L_{h-1}) ⊇
  * L_{h-1}: seeds self-vote in, neighbourhoods only widen, and a
  * labeled non-seed always has a labeled neighbour by induction),
  * while LABELS of non-seed nodes may legitimately flip as deeper
  * votes arrive; the registered contract is therefore a FIXED round
  * count (the graph_pagerank/kcore/bfs precedent), not a fixed point —
  * free-running LPA need not converge (2-cycles oscillate).
  *
  * Contract (shared with [[Triangles]]/[[KCore]]/[[Bfs]]): `edges` is
  * one row per undirected edge (a, b), deduped; `seeds` is (v, label)
  * — duplicate seed rows for one node resolve to min(label) so the
  * input relation's row order can't matter. Nodes the diffusion never
  * reaches emit no row.
  */
object LabelProp {

  /** Seed self-vote weight: must exceed any node degree, or a hub
    * seed's neighbourhood could outvote its clamp. 10⁹ is ~5 orders
    * beyond the densest fixture degree and still sums without overflow
    * at any realistic multiplicity (10⁹ · degree ≪ 2⁶³).
    */
  val ClampWeight = 1000000000L

  /** Labels after `rounds` clamped mode-vote rounds, as
    * `(node, label)`.
    */
  def propagate(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame =
    propagateOnAdj(
      edges.select(col("a").as("v"), col("b").as("n"))
        .union(edges.select(col("b").as("v"), col("a").as("n"))),
      seeds, rounds)

  /** [[propagate]] over a PRE-SYMMETRIZED (v, n) adjacency — the
    * [[Graphs.GraphIndex]] serving form. The unit edge weights and the
    * seed clamp self-loops are added here (the clamp depends on the
    * caller's seed set, so it cannot live in the cached frame).
    */
  def propagateOnAdj(symAdj: DataFrame, seeds: DataFrame,
                     rounds: Int,
                     broadcastState: Boolean = false): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val seed = seeds.toDF("v", "label")
      .groupBy(col("v")).agg(min(col("label")).as("label"))
    val adj = symAdj.select(col("v"), col("n"), lit(1L).as("wt"))
      .union(seed.select(col("v"), col("v").as("n"), lit(ClampWeight).as("wt")))
    val w = Window.partitionBy(col("v"))
      .orderBy(col("wt").desc, col("label").asc)
    // broadcastState: OFF by default — the forced broadcast MEASURED
    // SLOWER in round-18's full-surface close lane where it counts
    // most, the steady-state serving row: graph_labelprop_idx read
    // 6.63/8.48 s (passes) with the broadcast forced vs a stable
    // 4.17/3.99 across two full runs without it (same boot, artifact-
    // warm both times); the build-included row read equal (6.3 vs
    // 6.4/6.6). Mechanically: each vote round's widest relation (the
    // join fan-out) is re-keyed to n and exchanged for the (v, label)
    // weight sum REGARDLESS of join strategy, so the broadcast saves no
    // edge movement — the shuffle plan's identical per-round adjacency
    // exchange is planned once and REUSED (ReusedExchange) — while the
    // forced build adds an eager per-round broadcast job over the
    // chained state plan. True remains available for layouts where the
    // adjacency exchange cannot be reused.
    def bc(df: DataFrame): DataFrame =
      if (broadcastState) Hints.nodeState(df) else df
    var cur = seed
    for (_ <- 1 to rounds) {
      cur = bc(cur).join(adj, "v")
        .select(col("n").as("v"), col("label"), col("wt"))
        .groupBy(col("v"), col("label")).agg(sum(col("wt")).as("wt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("v"), col("label"))
    }
    cur.select(col("v").as("node"), col("label"))
  }
}
