package graft

import org.apache.spark.sql.functions._

/** Stage profile for `dedup_cluster`: split pair-finding from the CC
  * iteration, count convergence rounds, and time min-label propagation
  * against the large-star/small-star variant on the SAME edge set.
  * `sbt "runMain graft.ProfileCc [sfDir]"`.
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = LocalSession.create("32")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile-cc] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // pair-finding cost, isolated and materialized (this is what
    // components() localCheckpoints internally)
    val pairs = SparkEntry.queries("dedup_neardup")(spark, dir)
      .select(col("d1").as("src"), col("d2").as("dst"))
    t("pairs (cold)") { pairs.count() }
    val edges = pairs.localCheckpoint()
    t("pairs (warm re-run)") { pairs.count() }

    for (rep <- 1 to 2) {
      val l = t(s"min-label CC (rep $rep)") {
        graft.operators.ConnectedComponents.components(edges).count()
      }
      println(s"[profile-cc]   rounds=${graft.operators.ConnectedComponents.lastRounds} labels=$l")
      val s = t(s"star CC      (rep $rep)") {
        graft.operators.ConnectedComponents.componentsStar(edges).count()
      }
      println(s"[profile-cc]   rounds=${graft.operators.ConnectedComponents.lastRounds} labels=$s")
    }
    spark.stop()
  }
}
