package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase/round attribution for `graph_kcore` — edge-build cost, then
  * per-round wall time against the shrinking frontier size, so the
  * iteration's cost profile (fixed per-round overhead vs frontier-
  * proportional work) is measured, not guessed. A local iteration aid
  * like [[ProfilePagerank]]; not part of the driver contract.
  *
  * Usage: `sbt "runMain graft.ProfileKcore [sfDir]"`.
  */
object ProfileKcore {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val t0 = System.nanoTime()
    val so = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk"))
      .distinct()
    val e = so.alias("x")
      .join(so.alias("y"), col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("a"), col("y.sk").as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = e.count()
    println(f"[profile-kcore] edges=$nEdges buildSec=${(System.nanoTime() - t0) / 1e9}%.1f")
    val steps = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    var last = System.nanoTime()
    val cores = operators.KCore.coreNumbers(e, stepsPerRound = steps,
      roundHook = { (round, changed) =>
        val now = System.nanoTime()
        println(f"[profile-kcore] round=$round changed=$changed sec=${(now - last) / 1e9}%.2f")
        last = now
      })
    val n = cores.count()
    println(f"[profile-kcore] nodes=$n totalSec=${(System.nanoTime() - t0) / 1e9}%.1f")
    e.unpersist(false)
    spark.stop()
  }
}
