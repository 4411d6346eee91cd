package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exhaustive triangle enumeration over an oriented edge relation —
  * the operator behind the `graph_triangles` query (see
  * graft.queries.Extra7; reference /root/reference/task.ts has no
  * analogue — this is engine graph-analytics surface).
  *
  * Contract: `edges` is one row per undirected edge, directed by ANY
  * total order on nodes (a → b with a below b in the order, deduped).
  * Each triangle {x, y, z} then appears exactly once as the 2-path
  * a→b→c (a<b<c in the order) closed by the edge a→c, so the
  * enumeration is two equi hash joins — wedge join on the shared
  * middle, closing-edge join on the endpoints — and per-node counts
  * are orientation-INDEPENDENT (the enumeration is exhaustive under
  * any total order; TrianglesSpec pins id-order ≡ degree-order
  * counts).
  *
  * Scale shape: the wedge relation (Σ outdeg² rows) is the plan's
  * largest intermediate by an order of magnitude, so (1) it must
  * STREAM through shuffled-hash joins, never sort — the SHUFFLE_HASH
  * hints below; the default sort-merge plan sorted 1.8 G wedge rows at
  * the 100× dial and died on >75 GB of sort spill (PERF.md round-14) —
  * and (2) its SIZE is the orientation's lever: [[orientByDegree]]
  * directs each edge toward the higher-(degree, id) endpoint, bounding
  * out-degrees by O(√m) on skewed graphs (Schank & Wagner 2005, the
  * "forward" algorithm), which minimizes Σ outdeg² exactly where
  * id-order explodes it (a low-id hub owns ALL its star's wedges under
  * id-order and NONE under degree-order). On near-uniform degree
  * distributions the two orientations cost the same — the query keeps
  * id-order as its deterministic oracle contract and the operator
  * ships the skew escape hatch.
  */
object Triangles {
  /** Generalized enumeration over three edge relations sharing the
    * oriented contract: triangles whose wedge edge (u,v) comes from
    * `e1s`, closing wedge edge (v,w) from `e2s`, and closing edge
    * (u,w) from `e3s`. [[triangleRows]] is the diagonal case; the
    * streaming incremental form
    * ([[graft.streaming.StreamOps.triangleCountSink]]) uses asymmetric
    * slots to enumerate only the triangles a NEW edge batch closes.
    */
  def triangleRowsAcross(e1s: DataFrame, e2s: DataFrame,
                         e3s: DataFrame): DataFrame =
    e1s.alias("e1")
      .join(e2s.alias("e2").hint("shuffle_hash"),
        col("e1.b") === col("e2.a"))
      .join(e3s.alias("e3").hint("shuffle_hash"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("u"), col("e1.b").as("v"), col("e2.b").as("w"))

  /** Triangle rows (u < v < w in the edge orientation's order), one per
    * triangle. SHUFFLE_HASH on the edge sides: the edge relation is the
    * provably smaller side (|wedges| ≥ |edges| · avg outdeg), and the
    * wedge stream must never pay a sort.
    */
  def triangleRows(edges: DataFrame): DataFrame =
    triangleRowsAcross(edges, edges, edges)

  /** [[triangleRows]] with a Bloom-filter WEDGE PRUNE (optimization
    * guide §3.2 — pre-filter the big side before shuffling it): the
    * wedge relation (Σ outdeg² rows) is the plan's dominant exchange,
    * yet only wedges whose closing edge (u, w) EXISTS survive the
    * second join — a tiny fraction on sparse graphs. A Bloom filter
    * over the closing-edge keys, broadcast and applied BETWEEN the two
    * joins (map-side, in the wedge join's own stage), drops
    * definitely-non-closing wedges before they cross the wire. False
    * positives only cost their own shuffle bytes — the exact closing
    * equi join re-checks every survivor, so the output is IDENTICAL
    * (no false negatives; TrianglesSpec pins pruned ≡ unpruned).
    *
    * `expectedEdges` sizes the filter (callers hold the edge relation
    * persisted, so a count is one cached scan; ≥ true count keeps the
    * fpp honest). Scale note: the filter costs ~10 bits/edge at 1% fpp
    * — ~1.2 GB per 10⁹ edges — so at extreme edge counts callers
    * should fall back to [[triangleRows]] (the broadcast must fit every
    * executor, the guide's §3.2 cost paragraph); the query call sites
    * gate on [[BloomPruneMaxEdges]].
    */
  def triangleRowsPruned(edges: DataFrame, expectedEdges: Long,
                         fpp: Double = 0.01): DataFrame = {
    val bf = edges.select(xxhash64(col("a"), col("b")).as("k"))
      .stat.bloomFilter("k", math.max(expectedEdges, 1L), fpp)
    val bfB = edges.sparkSession.sparkContext.broadcast(bf)
    val mightClose = udf((k: Long) => bfB.value.mightContainLong(k))
    edges.alias("e1")
      .join(edges.alias("e2").hint("shuffle_hash"),
        col("e1.b") === col("e2.a"))
      // the prune sits ABOVE the wedge join and BELOW the closing
      // join's exchange — plan-checked in plans/r19
      .filter(mightClose(xxhash64(col("e1.a"), col("e2.b"))))
      .join(edges.alias("e3").hint("shuffle_hash"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("u"), col("e1.b").as("v"), col("e2.b").as("w"))
  }

  /** Edge-count ceiling for the wedge-prune Bloom filter (~10 bits per
    * edge at 1% fpp ⇒ ~600 MB at this cap — a broadcast every executor
    * can hold). Above it, callers run the unpruned enumeration.
    */
  val BloomPruneMaxEdges: Long = 500000000L

  /** Triangles containing ≥ 1 edge of `fresh`, given `olds` DISJOINT
    * from it (both oriented by the same total order) — the exact
    * INCREMENTAL delta Δtri(olds ∪ fresh) − tri(olds), enumerated once
    * each via three DISJOINT slot cases (first fresh slot is e1, e2, or
    * e3; earlier slots old):
    * fresh×all×all ∪ old×fresh×all ∪ old×old×fresh. Every case joins
    * with the fresh batch as a side, so the per-batch cost is
    * batch-proportional, never a full re-enumeration.
    */
  def newTriangleRows(olds: DataFrame, fresh: DataFrame): DataFrame = {
    val all = olds.unionAll(fresh)
    triangleRowsAcross(fresh, all, all)
      .unionAll(triangleRowsAcross(olds, fresh, all))
      .unionAll(triangleRowsAcross(olds, olds, fresh))
  }

  /** Per-node triangle participation counts (node, n_triangles) —
    * each triangle credits all three corners; nodes in no triangle
    * don't appear. The 3× explode is map-side and the count combines
    * before its exchange (gate-pinned in PlanSpec), so only (node,
    * partial count) rows cross the wire.
    */
  def perNodeCounts(edges: DataFrame): DataFrame =
    countCorners(triangleRows(edges))

  /** [[perNodeCounts]] over the Bloom-pruned enumeration — identical
    * output (the prune has no false negatives and the closing join
    * verifies every candidate); the query call sites pass the persisted
    * edge relation's count.
    */
  def perNodeCountsPruned(edges: DataFrame, expectedEdges: Long): DataFrame =
    countCorners(
      if (expectedEdges <= BloomPruneMaxEdges)
        triangleRowsPruned(edges, expectedEdges)
      else triangleRows(edges))

  private def countCorners(tris: DataFrame): DataFrame =
    tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))

  /** Re-orient an id-ordered edge relation (a < b) by ascending
    * (degree, id): each edge points at its higher-(degree, id)
    * endpoint. A total order, so [[perNodeCounts]] over the result
    * equals the id-ordered counts — but Σ outdeg² (the wedge mass) is
    * bounded by O(m^1.5) instead of a hub's deg² (Schank & Wagner
    * 2005). Two node-sized hash joins + a row-local swap; the edge set
    * itself is unchanged.
    */
  def orientByDegree(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    edges
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("oa"),
        when(aFirst, col("b")).otherwise(col("a")).as("ob"))
      .select(col("oa").as("a"), col("ob").as("b"))
  }

  /** Σ outdeg² — the wedge-join row count the orientation controls;
    * observability for the skew trade (the [[MinHash.droppedBuckets]]
    * analogue: measure the lever, don't guess).
    */
  def wedgeMass(edges: DataFrame): Long =
    edges.groupBy(col("a")).agg(count(lit(1)).as("od"))
      // sum over ZERO groups is null (empty edge relation) — 0 wedges
      .agg(coalesce(sum(col("od") * col("od")), lit(0L)))
      .collect()(0).getLong(0)
}
