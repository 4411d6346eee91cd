package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** Measures BPE training past the toy k (round-16 verdict #6: the
  * state-shrinks-per-round claim was written, not measured, beyond
  * k = 8): trains k ∈ {8, 64, 256} on the fixture corpus and reports
  * wall time plus the symbol-state row count at checkpoints — the
  * linear-rounds/shrinking-state scaling argument as a table for
  * PERF.md. A local measurement aid, not part of the driver contract.
  *
  * Usage: `sbt "runMain graft.SweepBpe [sfDir] [k1,k2,...]"`.
  */
object SweepBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ks = args.drop(1).headOption.map(_.split(',').map(_.toInt).toSeq)
      .getOrElse(Seq(8, 64, 256))
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val words = Tables(spark, dir, "documents")
      .select(explode(org.apache.spark.sql.functions.filter(
        split(lower(col("text")), " "),
        (t: org.apache.spark.sql.Column) => t =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = words.count()
    val chars = words
      .select(explode(sequence(lit(1), length(col("w")))).as("p"), col("w"))
      .select(col("w").substr(col("p"), lit(1)).as("ch")).count()
    println(s"[sweep-bpe] dir=$dir distinctWords=$n seedStateRows=$chars")
    for (k <- ks) {
      val report = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
      val t0 = System.nanoTime()
      val merges = BpeTrain.trainMerges(words, k, roundHook = (step, rows) =>
        if (step == 1 || step % 32 == 0 || step == k) report += ((step, rows)))
      val mCount = merges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sweep-bpe] k=$k%-4d trainSec=$sec%.1f secPerRound=${sec / k}%.3f " +
        f"merges=$mCount stateRows=${report.map { case (s, r) => s"$s:$r" }.mkString(",")}")
    }
    words.unpersist(false)
    spark.stop()
  }
}
