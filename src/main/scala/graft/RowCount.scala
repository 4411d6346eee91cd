package graft

import org.apache.spark.sql.SparkSession

/** Row-count probe for registered queries at arbitrary SF dirs —
  * verifies result-size scaling during scale-stress runs (PERF.md).
  * `sbt "runMain graft.RowCount <sfDir> <query> [query…]"`.
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RowCount <sfDir> <query> [query…]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { q =>
      println(s"[rowcount] $q @ $dir = ${SparkEntry.queries(q)(spark, dir).count()}")
    }
    spark.stop()
  }
}
