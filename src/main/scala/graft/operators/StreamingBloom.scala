package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.util.sketch.BloomFilter

/** Streaming Bloom membership screen — the ingest-time form of
  * [[BloomDedup]], completing its story the way [[StreamingMinHash]]
  * completes MinHash (SURVEY.md §2.3).
  *
  * Each arriving document's content hash is probed against an
  * accumulated Bloom filter of everything seen BEFORE its micro-batch,
  * then added. State is sharded by hash so no single key's filter grows
  * with the corpus: per-(shard) `flatMapGroupsWithState` holds one
  * serialized bloom of fixed size — total state = shards × bits,
  * chosen up front by (expectedPerShard, fpp), independent of arrival
  * count (an overfull bloom degrades fpp, never correctness: still no
  * false negatives).
  *
  * Batch semantics, chosen for DETERMINISM: within one micro-batch a
  * shard probes every row against the filter as of BATCH START, then
  * inserts all of the batch's hashes. Two copies of the same text in
  * the SAME batch are therefore both unflagged — intra-batch dedup is
  * a plain `dropDuplicates` inside the batch and not this operator's
  * job — but the result no longer depends on arrival order within the
  * batch (probe-then-emit under arrival order would flag whichever
  * copy iterated second).
  *
  * Hash parity: [[contentHash]] calls the SAME `XxHash64Function`
  * (seed 42) Spark's `xxhash64` expression uses, so streamed hashes are
  * bit-identical to the batch [[BloomDedup.screenReport]] relation
  * (spec-gated).
  */
object StreamingBloom {
  case class Doc(doc_id: Long, text: String)
  case class Screened(doc_id: Long, h: Long, shard: Int, maybe_seen: Boolean)

  /** Bit-identical twin of the batch `xxhash64(text)` column. */
  def contentHash(text: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(text),
      org.apache.spark.sql.types.StringType, 42L)

  /** Screen a document stream: emit one row per arriving doc with
    * `maybe_seen` = bloom verdict against all PRIOR micro-batches
    * (no false negatives; ~fpp false positives routed to exact
    * verification downstream, the [[BloomDedup]] contract).
    */
  def screen(docs: Dataset[Doc], shards: Int = 8,
             expectedPerShard: Long = 100000L,
             fpp: Double = 0.01): Dataset[Screened] = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    import docs.sparkSession.implicits._
    docs
      .map { d =>
        val h = contentHash(d.text)
        (math.floorMod(h, shards.toLong).toInt, d.doc_id, h)
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], Screened](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Byte]]) =>
          val bf = state.getOption
            .map(b => BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
            .getOrElse(BloomFilter.create(expectedPerShard, fpp))
          val batch = rows.toVector
          // probe EVERYTHING against batch-start state first (see
          // object doc: determinism beats intra-batch flagging)…
          val out = batch.map { case (_, id, h) =>
            Screened(id, h, shard, bf.mightContainLong(h))
          }
          // …then insert the batch and persist the filter.
          batch.foreach { case (_, _, h) => bf.putLong(h) }
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          state.update(bos.toByteArray)
          out.iterator
      }
  }
}
