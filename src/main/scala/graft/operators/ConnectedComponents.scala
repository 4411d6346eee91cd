package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by minimum-label propagation ("hash-to-min") —
  * the final step of corpus deduplication: near-dup PAIRS become duplicate
  * CLUSTERS, and each cluster keeps one canonical document.
  *
  * Each round every vertex adopts the smallest component label among
  * itself and its neighbours; convergence takes O(graph diameter) rounds.
  * Near-dup graphs are unions of small dense cliques (diameter 1-2), so
  * 2-3 rounds close them; the published escalation for long-chain graphs
  * at 100 TB is large-star/small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond"), which squares the paths per
  * round. Every round localCheckpoints: iterative plans otherwise stack
  * lineage until the optimizer chokes — the standard Spark iterative-
  * algorithm discipline.
  */
object ConnectedComponents {
  /** (v, c): component label c = min vertex id reachable from v.
    * `edges` must have columns (src, dst); the graph is treated as
    * undirected; isolated vertices don't appear (join the vertex set
    * back if they must).
    */
  def components(edges: DataFrame, maxIterations: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("c", col("v"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxIterations) {
      val viaNbr = sym.join(labels, sym("dst") === labels("v"))
        .groupBy(col("src")).agg(min(col("c")).as("nc"))
      val next = labels.join(viaNbr, labels("v") === viaNbr("src"), "left")
        .select(labels("v").as("v"),
          least(col("c"), coalesce(col("nc"), col("c"))).as("c"))
        .localCheckpoint()
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.v") === col("o.v"))
        .filter(col("n.c") =!= col("o.c"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      round += 1
    }
    labels
  }
}
