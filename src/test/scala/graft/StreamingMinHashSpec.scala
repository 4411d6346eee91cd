package graft

import graft.operators.{MinHash, StreamingMinHash}
import graft.operators.StreamingMinHash.Doc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash-LSH near-dup ([[StreamingMinHash]]) against the
  * batch path on the real documents fixture: the row-local signature
  * must be BIT-identical to [[MinHash.signatures]], and the streamed
  * candidate-pair set must equal batch `lshCandidates` — regardless of
  * how the corpus is split into micro-batches (bucket state carries
  * across batches).
  */
class StreamingMinHashSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtureDocs: Seq[Doc] = {
    import spark.implicits._
    Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[Doc]
      .collect().toSeq.sortBy(_.doc_id)
  }

  /** The REAL batch pipeline input (not a copy that could drift). */
  private def batchShingles = graft.queries.ScaleOps.hashedShingles(spark, sf)

  test("row-local streaming signature is bit-identical to the batch signature") {
    val batch = MinHash.signatures(batchShingles)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val docs = fixtureDocs
    assert(batch.nonEmpty)
    docs.foreach { d =>
      val local = StreamingMinHash.signature(d.text)
      batch.get(d.doc_id).foreach { b =>
        assert(java.util.Arrays.equals(local, b),
          s"signature mismatch for doc ${d.doc_id}")
      }
    }
  }

  private def streamPairs(batches: Seq[Seq[Doc]]): Set[(Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Doc]
    val name = s"minhash_stream_${batches.map(_.size).mkString("_")}"
    val q = StreamingMinHash.candidatePairs(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
  }

  test("streamed candidate pairs equal batch lshCandidates (single batch)") {
    val batchCand = MinHash.lshCandidates(MinHash.signatures(batchShingles))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = streamPairs(Seq(fixtureDocs))
    assert(batchCand.nonEmpty, "fixture should produce candidates")
    assert(streamed === batchCand)
  }

  test("bucket state carries across micro-batches (same pairs, any split)") {
    val batchCand = MinHash.lshCandidates(MinHash.signatures(batchShingles))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = fixtureDocs
    val (a, b) = docs.splitAt(docs.length / 3)
    val streamed = streamPairs(Seq(a, b))
    assert(streamed === batchCand,
      "cross-batch pairs lost: state did not carry between micro-batches")
  }
}
