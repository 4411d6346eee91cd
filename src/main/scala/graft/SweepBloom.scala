package graft

import org.apache.spark.sql.functions._

/** Scale probe for the Bloom membership screen: at a REAL split (seen =
  * half the corpus, not the fixture's 250-doc dial) measure the bloom
  * build (the driver-merge step whose memory ceiling
  * `operators/BloomDedup.scala` documents), the serialized filter size,
  * and the probe pass — substantiating that the probe side is a
  * broadcast-map over the incoming scan at any corpus size.
  * `sbt "runMain graft.SweepBloom <sfDir> [fpp]"`.
  */
object SweepBloom {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SweepBloom <sfDir> [fpp]")
    val dir = args(0)
    val fpp = if (args.length > 1) args(1).toDouble else 0.01
    val spark = LocalSession.create("32")

    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = docs.agg(count(lit(1)), expr("max(doc_id)")).head()
      val n = stats.getLong(0)
      require(n > 0 && !stats.isNullAt(1), s"no documents under $dir")
      val splitId = stats.getLong(1) / 2
      val seen = docs.filter(col("doc_id") < splitId)
      val incoming = docs.filter(col("doc_id") >= splitId)
      val nSeen = seen.count(); val nIn = incoming.count()
      println(f"[sweep-bloom] corpus $n%d docs, seen $nSeen%d, incoming $nIn%d, fpp $fpp")

      val t0 = System.nanoTime()
      val bf = seen.stat.bloomFilter("h", math.max(nSeen, 1L), fpp)
      val buildS = (System.nanoTime() - t0) / 1e9
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      println(f"[sweep-bloom] build $buildS%.2f s, filter ${bos.size / 1024.0 / 1024.0}%.1f MiB " +
        f"(driver-held; the documented ceiling dial)")

      // the OPERATOR's probe, not a reimplementation — the sweep must
      // measure what shipping code does
      val t1 = System.nanoTime()
      val flagged = graft.operators.BloomDedup.probe(spark, bf, incoming, "h")
        .filter(col("maybe_seen")).count()
      val probeS = (System.nanoTime() - t1) / 1e9
      // exact duplicate count for the fp-rate readout
      val exact = incoming.join(seen.select(col("h")).distinct(), "h").count()
      val fpObserved =
        if (nIn - exact == 0) 0.0 else (flagged - exact).toDouble / (nIn - exact)
      println(f"[sweep-bloom] probe $probeS%.2f s (broadcast map over the incoming scan), " +
        f"flagged $flagged%d, exact $exact%d, observed fp rate $fpObserved%.4f (bound $fpp)")

      // sharded escalation (round 11): k hash-range blooms built and
      // probed in sequence — the per-shard filter is the PEAK driver /
      // executor residency, vs the whole filter above. Latency trades a
      // k× job count for the k× smaller merge; same guarantee cells.
      for (k <- Seq(4, 16)) {
        val t2 = System.nanoTime()
        val shardBytes = {
          val b = seen.filter(pmod(col("h"), lit(k.toLong)) === 0L)
            .stat.bloomFilter("h", math.max(nSeen / k, 1L), fpp)
          val s = new java.io.ByteArrayOutputStream(); b.writeTo(s); s.size
        }
        val flaggedSharded = graft.operators.BloomDedup
          .flagMaybeSeenSharded(spark, seen, incoming, "h",
            math.max(nSeen, 1L), fpp, shards = k)
          .filter(col("maybe_seen")).count()
        val shardS = (System.nanoTime() - t2) / 1e9
        println(f"[sweep-bloom] sharded k=$k%d: build+probe $shardS%.2f s, " +
          f"peak filter ${shardBytes / 1024.0 / 1024.0}%.2f MiB/shard " +
          f"(vs ${bos.size / 1024.0 / 1024.0}%.1f single), flagged $flaggedSharded%d " +
          f"(exact $exact%d still all caught: ${flaggedSharded >= exact})")
      }
    } finally {
      docs.unpersist(false)
      spark.stop()
    }
  }
}
