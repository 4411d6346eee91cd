package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition — core number per node — over an undirected
  * edge relation: the operator behind `graph_kcore` (graft.queries
  * .Extra7; reference /root/reference/task.ts has no analogue — engine
  * graph-analytics surface, the third graph discipline next to
  * label-propagation CC/PageRank and enumeration Triangles).
  *
  * Algorithm: the h-index fixed point (Montresor, De Pellegrini,
  * Miorandi, "Distributed k-core decomposition", 2013; Lü et al. 2016):
  * start every node at its degree and repeatedly replace each estimate
  * with the H-INDEX of its neighbours' estimates (the largest h such
  * that ≥ h neighbours hold ≥ h). Estimates only DECREASE (each update
  * is monotone in the neighbour values, and h ≤ degree seeds the
  * induction), and the fixed point is exactly the core number. This is
  * the distributed form of the classic sequential peel — chosen over a
  * literal min-degree peel because a peel's round count is the number
  * of DISTINCT PEEL WAVES (hundreds on a dense graph: one driver-loop
  * round per wave), while the h-index iteration converges in a few
  * dozen rounds regardless of the core-value range.
  *
  * Scale shape — the inverse of PageRank's: per-round work SHRINKS. A
  * node's estimate can only change when a neighbour's changed, so each
  * round recomputes h-indexes only for the CHANGED FRONTIER's
  * neighbourhood and carries everything else forward untouched; the
  * frontier empties monotonically (that emptiness IS the convergence
  * test — no digest needed). Each recompute is one equi join
  * (adjacency ⋈ estimates, node-keyed) + one window rank + one
  * map-side-combined max — the window's (v)-hash exchange is reused by
  * the groupBy that follows, so a round moves the affected adjacency
  * rows through ONE exchange. Round state is localCheckpoint'ed and
  * the superseded round's blocks freed eagerly ([[Checkpoints.free]],
  * the PageRank/Lloyd discipline) — O(nodes) resident, not O(rounds ×
  * nodes). No broadcast-nested-loop anywhere (gate-pinned in
  * PlanSpec).
  *
  * Contract (shared with [[Triangles]]): `edges` is one row per
  * undirected edge (a, b), deduped; orientation is irrelevant here
  * (the adjacency is symmetrized). Nodes with no edges don't appear
  * (a node outside every edge has core 0 by convention and no row).
  */
object KCore {
  /** (node, core) — core number per node, exact at the fixed point.
    * Fails loudly if `maxIterations` rounds don't reach it (raise the
    * cap; silent truncation would return plausible-but-wrong numbers).
    */
  def coreNumbers(edges: DataFrame, maxIterations: Int = 64): DataFrame = {
    // symmetrized adjacency feeds every round → persist once
    val adj = edges.select(col("a").as("v"), col("b").as("n"))
      .unionAll(edges.select(col("b").as("v"), col("a").as("n")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // round 0: estimate = degree (the h-index seed); frontier = all
    var est = adj.groupBy(col("v"))
      .agg(count(lit(1)).cast("int").as("c"))
      .localCheckpoint()
    var frontier = est.select(col("v")).localCheckpoint()
    var round = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && round < maxIterations) {
      // only neighbours of changed nodes can change: the shrinking set
      val affected = adj
        .join(frontier.select(col("v").as("n")), Seq("n"))
        .select(col("v")).distinct()
      // h-index over ALL neighbours of each affected node: rank the
      // neighbour estimates descending, h = max(min(rank, estimate))
      val w = Window.partitionBy(col("v")).orderBy(col("nc").desc)
      val upd = adj.join(affected, Seq("v"))
        .join(est.select(col("v").as("n"), col("c").as("nc")), Seq("n"))
        .select(col("v"), col("nc"))
        .withColumn("r", row_number().over(w))
        .select(col("v"), least(col("r"), col("nc")).as("m"))
        .groupBy(col("v")).agg(max(col("m")).as("u"))
      // carry unaffected estimates forward; least() is defensive — the
      // monotonicity argument says u <= c always (est came from older,
      // >= current neighbour values)
      val next = est.join(upd, Seq("v"), "left")
        .select(col("v"), coalesce(least(col("u"), col("c")), col("c")).as("c"),
          (col("u").isNotNull && col("u") < col("c")).as("chg"))
        .localCheckpoint()
      val newFrontier = next.filter(col("chg")).select(col("v")).localCheckpoint()
      frontierSize = newFrontier.count()
      Checkpoints.free(est)
      Checkpoints.free(frontier)
      est = next.select(col("v"), col("c"))
      frontier = newFrontier
      round += 1
    }
    require(frontierSize == 0,
      s"k-core h-index iteration still moving after $maxIterations rounds " +
        "— raise maxIterations (result would be an upper bound, not the core)")
    adj.unpersist(false)
    est.select(col("v").as("node"), col("c").cast("long").as("core"))
  }
}
