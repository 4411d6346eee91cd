package graft

import org.apache.spark.storage.StorageLevel

/** Scale decades for the image-dedup path ([[graft.operators.Multimodal]]
  * dHash + banded Hamming pairs): generate the synthetic-raster corpus
  * at increasing dials, time the row-local hash pass and the band join
  * separately, and report pair counts — so the multimodal dedup story
  * carries the same measured decade table as text/embeddings (PERF.md).
  * Not part of the driver contract; a local iteration aid like
  * [[SweepEmbedDedup]].
  *
  * Usage: `sbt "runMain graft.SweepPhash [n1 n2 ...]"` (default
  * 4800 / 48000 / 480000 — the 48-raster query's dial ×100/×1000/×10000;
  * ids triple through the planted-dup generator).
  */
object SweepPhash {
  def main(args: Array[String]): Unit = {
    val dials = if (args.nonEmpty) args.toSeq.map(_.toInt)
                else Seq(4800, 48000, 480000)
    val spark = LocalSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    for (n <- dials) {
      val t0 = System.nanoTime()
      val hashes = graft.operators.Multimodal.dHash(
          graft.operators.Multimodal.syntheticImagesWithDups(spark, n),
          graft.operators.Multimodal.ImageIoCodec)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val rows = hashes.count()
      val tHash = (System.nanoTime() - t0) / 1e9
      val distinctHashes = hashes.select("phash").distinct().count()
      val t1 = System.nanoTime()
      val pairs = graft.operators.Multimodal.phashDupes(hashes, maxDistance = 6)
        .count()
      val tJoin = (System.nanoTime() - t1) / 1e9
      hashes.unpersist(false)
      println(f"[sweep-phash] n=$n rows=$rows distinct=$distinctHashes " +
        f"pairs=$pairs hashSec=$tHash%.1f joinSec=$tJoin%.1f")
    }
    spark.stop()
  }
}
