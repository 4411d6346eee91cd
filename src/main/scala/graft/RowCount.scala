package graft


/** Row-count probe for registered queries at arbitrary SF dirs —
  * verifies result-size scaling during scale-stress runs (PERF.md).
  * `sbt "runMain graft.RowCount <sfDir> <query> [query…]"`.
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RowCount <sfDir> <query> [query…]")
    val dir = args(0)
    val spark = LocalSession.create("32")
    args.drop(1).foreach { q =>
      println(s"[rowcount] $q @ $dir = ${SparkEntry.queries(q)(spark, dir).count()}")
    }
    spark.stop()
  }
}
