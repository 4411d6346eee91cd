package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase attribution for `graph_pagerank` — which of (edge build, degree
  * agg, per-round propagate) carries the cost. A local iteration aid
  * like [[ProfileCc]]; not part of the driver contract.
  *
  * Usage: `sbt "runMain graft.ProfilePagerank [sfDir]"`.
  */
object ProfilePagerank {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile-pr] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey"))
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey"))
    val e0 = li.join(o, "ok")
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0
      .unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ne = t("edges build+persist+count")(edges.count())
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nNodes = t("deg agg+count")(deg.count())
    println(s"[profile-pr] edges=$ne nodes=$nNodes")
    val teleport = (1.0 - queries.Extra6.PrDamping) / nNodes
    var ranks: DataFrame = deg
      .select(col("src").as("node"), round(lit(1.0 / nNodes), 10).as("pr"))
    for (i <- 1 to queries.Extra6.PrIters) {
      val w = ranks.join(deg, ranks("node") === deg("src"))
        .select(col("node"), (col("pr") / col("outdeg")).as("w"))
      val next = edges.join(w, edges("src") === w("node"))
        .groupBy(col("dst"))
        .agg(round(lit(teleport) + lit(queries.Extra6.PrDamping) * sum(col("w")), 10)
          .as("pr"))
        .select(col("dst").as("node"), col("pr"))
      ranks = t(s"round $i (materialized)")(next.localCheckpoint())
    }
    t("top-20")(ranks.orderBy(col("pr").desc, col("node")).limit(20).collect())
    edges.unpersist(false)
    spark.stop()
  }
}
