package graft

import graft.operators.StreamingBloom
import graft.operators.StreamingBloom.{Doc, Screened}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Bloom screen ([[StreamingBloom]]): the no-false-negative
  * guarantee across micro-batches, the deterministic probe-then-insert
  * batch semantics, hash parity with the batch `xxhash64` relation, and
  * agreement with the batch [[graft.operators.BloomDedup]] screen on the
  * same seen/incoming split.
  */
class StreamingBloomSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def runBatches(batches: Seq[Seq[Doc]]): Seq[Screened] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val name = s"bloom_stream_${batches.map(_.size).mkString("_")}_${batches.hashCode.abs}"
    val q = StreamingBloom.screen(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[Screened].collect().toSeq
    } finally q.stop()
  }

  test("streamed content hash is bit-identical to the batch xxhash64 column") {
    import spark.implicits._
    val texts = Seq("alpha beta", "日本語テキスト", "", "x")
    val batch = texts.toDF("text")
      .select(col("text"), xxhash64(col("text")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      assert(StreamingBloom.contentHash(t) == batch(t),
        s"hash mismatch for '$t'")
    }
  }

  test("cross-batch duplicates are flagged; fresh and intra-batch copies are not") {
    val b1 = Seq(Doc(1, "first unique document body"),
                 Doc(2, "second unique document body"),
                 Doc(3, "third unique document body"))
    val b2 = Seq(Doc(10, "first unique document body"),   // dup of doc 1
                 Doc(11, "a brand new fourth document"),
                 Doc(12, "a brand new fourth document"))  // intra-batch copy
    val b3 = Seq(Doc(20, "a brand new fourth document"))  // now cross-batch dup
    val out = runBatches(Seq(b1, b2, b3)).map(s => s.doc_id -> s.maybe_seen).toMap
    assert(Seq(1L, 2L, 3L).forall(!out(_)), s"fresh batch-1 docs flagged: $out")
    assert(out(10L), "cross-batch duplicate must be flagged (no false negatives)")
    assert(!out(11L) && !out(12L),
      "intra-batch copies probe against batch-start state (deterministic semantics)")
    assert(out(20L), "batch-3 copy of a batch-2 doc must be flagged")
  }

  test("streamed screen agrees with the batch BloomDedup guarantee on a fixture split") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[Doc].collect().toSeq.sortBy(_.doc_id)
    val (seen, incoming) = docs.partition(_.doc_id < 250)
    val streamed = runBatches(Seq(seen, incoming))
      .filter(_.doc_id >= 250).map(s => s.doc_id -> s.maybe_seen).toMap
    val batchReport = graft.operators.BloomDedup
      .screenReport(spark, Tables(spark, sf, "documents"), splitId = 250L)
      .select(col("doc_id"), col("exact_dup"))
      .as[(Long, Boolean)].collect().toMap
    assert(streamed.nonEmpty && batchReport.nonEmpty)
    // the GUARANTEE must agree: every exact duplicate is flagged by the
    // stream too (filters differ in size, so fp sets may differ — only
    // the no-false-negative cell is portable).
    batchReport.foreach { case (id, exact) =>
      if (exact) assert(streamed(id),
        s"doc $id is an exact dup but the streamed screen missed it")
    }
  }
}
