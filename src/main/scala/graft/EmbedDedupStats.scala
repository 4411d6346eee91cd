package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Observability harness for the corpus-scale embedding dedup dial
  * ([[graft.operators.EmbedDedup]]): prints, for a given sf/scale dir,
  * the autoNlist the `dedup_embed_cells` query would use and how many
  * cells the `maxCellSize` cap drops — the recall/cost trade's measured
  * side, recorded next to the decade timings in PERF.md. Not part of the
  * driver contract; a local iteration aid like [[SweepIvf]].
  *
  * Usage: `sbt "runMain graft.EmbedDedupStats [sfDir] [maxCellSize]"`.
  */
object EmbedDedupStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxCellSize = args.drop(1).headOption.map(_.toInt).getOrElse(100000)
    val spark = LocalSession.create("32")
    val e = transform(col("embedding"), (x: Column) => x.cast("double"))
    val n = Tables(spark, dir, "embeddings").select(col("vec_id"), e.as("e"))
    val rows = n.count()
    val nlist = operators.EmbedDedup.autoNlist(rows)
    val t0 = System.nanoTime()
    val dropped = operators.EmbedDedup.droppedCells(n, nlist = nlist,
      maxCellSize = maxCellSize)
    println(f"[embeddedup] dir=$dir rows=$rows nlist=$nlist " +
      f"maxCellSize=$maxCellSize droppedCells=$dropped " +
      f"(${(System.nanoTime() - t0) / 1e9}%.2f s assign+count)")
    spark.stop()
  }
}
