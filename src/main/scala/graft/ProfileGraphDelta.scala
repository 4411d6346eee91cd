package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Prices incremental graph maintenance against the full rebuild — the
  * round-17 `applyDelta` decision row: build the co-purchase graph from
  * 99% of orders, then merge the held-out 1%'s edges as the arriving
  * delta (a real overlap mix: most held-out pairs already co-occur in
  * other orders), versus rebuilding from scratch over everything. The
  * numbers land in PERF.md; a local measurement aid, not part of the
  * driver contract.
  *
  * Usage: `sbt "runMain graft.ProfileGraphDelta [sfDir]"`.
  */
object ProfileGraphDelta {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def timed(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def edgesFor(s: org.apache.spark.sql.SparkSession,
                 pred: org.apache.spark.sql.Column) = {
      val so = Tables(s, dir, "lineitem").filter(pred)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk"))
        .distinct()
      so.alias("x")
        .join(so.alias("y"),
          col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
        .select(col("x.sk").as("a"), col("y.sk").as("b"))
        .distinct()
    }

    val s = spark.newSession()
    val baseT = timed(Graphs.index(
      edgesFor(s, pmod(col("l_orderkey"), lit(100)) =!= 0), "delta-base", s))
    // the delta ARRIVES in the scenario being priced ("a day of edges
    // landed") — materialize it OUTSIDE the timed window so applyDelta's
    // number prices the merge, not the delta's own derivation
    val delta = edgesFor(s, pmod(col("l_orderkey"), lit(100)) === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDelta = delta.count()
    // rebuild priced BEFORE the merge so the JVM warmth ordering favors
    // neither side over the base build's warmup
    val s2 = spark.newSession()
    val rebuildT = timed(Graphs.index(edgesFor(s2, lit(true)), "full", s2))
    val nFull = Graphs.index(
      sys.error("served"): org.apache.spark.sql.DataFrame, "full", s2)
      .edges.count()
    val deltaT = timed(Graphs.applyDelta("delta-base", s, delta))
    val g = Graphs.index(
      sys.error("served"): org.apache.spark.sql.DataFrame, "delta-base", s)
    val nEdges = g.edges.count()
    delta.unpersist(false)
    println(f"[graphdelta] base99Sec=$baseT%.1f deltaRows=$nDelta " +
      f"applyDeltaSec=$deltaT%.1f rebuildSec=$rebuildT%.1f " +
      f"speedup=${rebuildT / deltaT}%.1fx " +
      f"edgesAfterDelta=$nEdges edgesRebuild=$nFull " +
      s"identical=${nEdges == nFull}")

    // -- the RETRACTION lane (round-18): full graph minus the 1%-orders'
    // pairs via applyDeltaRemove, vs rebuilding over the EXCEPT set.
    // Same discipline: removal set materialized outside the timed
    // window, rebuild priced first.
    val s3 = spark.newSession()
    val fullT = timed(Graphs.index(edgesFor(s3, lit(true)), "rm-base", s3))
    val rm = edgesFor(s3, pmod(col("l_orderkey"), lit(100)) === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRm = rm.count()
    val s4 = spark.newSession()
    val rebuildRmT = timed(Graphs.index(
      edgesFor(s4, lit(true)).join(edgesFor(s4,
          pmod(col("l_orderkey"), lit(100)) === 0),
        Seq("a", "b"), "left_anti"), "rm-rebuild", s4))
    val nRebuildRm = Graphs.index(
      sys.error("served"): org.apache.spark.sql.DataFrame, "rm-rebuild", s4)
      .edges.count()
    val removeT = timed(Graphs.applyDeltaRemove("rm-base", s3, rm))
    val nAfterRm = Graphs.index(
      sys.error("served"): org.apache.spark.sql.DataFrame, "rm-base", s3)
      .edges.count()
    rm.unpersist(false)
    println(f"[graphdelta] fullSec=$fullT%.1f removeRows=$nRm " +
      f"applyRemoveSec=$removeT%.1f rebuildExceptSec=$rebuildRmT%.1f " +
      f"speedup=${rebuildRmT / removeT}%.1fx " +
      f"edgesAfterRemove=$nAfterRm edgesRebuild=$nRebuildRm " +
      s"identical=${nAfterRm == nRebuildRm}")
    spark.stop()
  }
}
