package graft

import graft.queries.EventTime
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Streaming harness (SURVEY.md §5.4): MemoryStream-driven runs of the
  * SAME transforms the batch oracle checks, plus watermark/late-data and
  * stateful-dedup behaviour that only exists in streaming.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("stream_ingest: streamed tumbling aggregation equals the batch run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchDf = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val rows = batchDf.as[Event].collect()

    val input = MemoryStream[Event]
    val q = StreamOps.tumbling(input.toDF())
      .writeStream.format("memory").queryName("stream_ingest_out")
      .outputMode("complete").start()
    withQuery(q) {
      // three micro-batches ≙ three scheduled invocations
      rows.grouped(math.max(1, rows.length / 3)).foreach(chunk => input.addData(chunk.toSeq))
      q.processAllAvailable()
      val streamed = spark.table("stream_ingest_out")
        .orderBy("wstart").collect().map(_.toSeq).toSeq
      val batch = EventTime.tumblingHourly(batchDf)
        .orderBy("wstart").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    }
  }

  test("streaming ANN top-k equals the batch operator per query batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = transform(col("embedding"),
      (x: org.apache.spark.sql.Column) => x.cast("double"))
    val data = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), e.as("e"))
    val queryRows = data.filter(col("vec_id") < 8)
      .as[(Long, Seq[Double])].collect()

    val input = MemoryStream[(Long, Seq[Double])]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[org.apache.spark.sql.Row])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-ckpt").toString
    val q = StreamOps.annTopKSink(
      input.toDF().toDF("vec_id", "e"), data, k = 3, nprobe = 2,
      checkpoint = ckpt,
      onBatch = (topk, id) => seen.synchronized { seen += id -> topk.collect().toSeq })
    withQuery(q) {
      // two micro-batches of queries; each must match the batch operator
      // run on exactly that query set (same index config, same code path)
      input.addData(queryRows.take(4).toSeq)
      q.processAllAvailable()
      input.addData(queryRows.drop(4).toSeq)
      q.processAllAvailable()
      val batches = seen.synchronized(seen.toList).sortBy(_._1)
      assert(batches.map(_._1) == List(0L, 1L))
      val batchSets = Seq(queryRows.take(4), queryRows.drop(4))
      for (((_, streamed), qs) <- batches.zip(batchSets)) {
        val expected = graft.operators.Ann.lshTopK(
            qs.toSeq.toDF("vec_id", "e"), data, k = 3, nprobe = 2)
          .collect().map(_.toSeq).toSet
        assert(streamed.map(_.toSeq).toSet === expected)
        assert(streamed.nonEmpty)
      }
    }
  }

  test("streaming triangle maintenance equals the batch operator cumulatively") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the real co-purchase edge builder at sf0.001 — the same graph the
    // batch query enumerates — streamed in three arrival-order batches,
    // with some edges sent REVERSED (the sink must canonicalize) and one
    // batch overlapping the previous (cross-batch dedup must hold)
    val so = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk")).distinct()
    val allEdges = so.alias("x")
      .join(so.alias("y"), col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("a"), col("y.sk").as("b")).distinct()
    val rows = allEdges.as[(Long, Long)].collect().toSeq
    val n = rows.length
    val batches = Seq(
      rows.take(n / 3).map { case (a, b) => (b, a) },       // reversed
      rows.slice(n / 3 - 50, 2 * n / 3),                    // overlaps prior
      rows.drop(2 * n / 3))
    val input = MemoryStream[(Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[Long, Long])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tri-ckpt").toString
    val q = StreamOps.triangleCountSink(
      input.toDF().toDF("a", "b"), checkpoint = ckpt,
      onBatch = (counts, id) => seen.synchronized {
        seen += id -> counts.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      })
    withQuery(q) {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = seen.synchronized(seen.toList).sortBy(_._1)
      assert(got.map(_._1) == List(0L, 1L, 2L))
      // each cumulative snapshot equals the batch operator over exactly
      // the edges seen so far (canonicalized + deduped)
      val prefixes = batches.inits.toSeq.reverse.drop(1).map(_.flatten)
      for (((_, streamed), prefix) <- got.zip(prefixes)) {
        val canon = prefix.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .distinct
        val expected = graft.operators.Triangles
          .perNodeCounts(canon.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(streamed === expected)
      }
      assert(got.last._2.nonEmpty, "no triangles surfaced — vacuous fixture")
    }
  }

  test("streaming edit-distance dedup equals the batch join cumulatively") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the registered text_editdist_blocked inputs at sf0.001 (120-char
    // prefixes) plus planted short strings (the no-segment stratum must
    // survive accumulation), streamed in three batches — batch 2
    // re-delivers 10 docs of batch 1 (seen ids must drop, not duplicate
    // pairs)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), substring(col("text"), 1, 120).as("t"))
      .as[(Long, String)].collect().toSeq
    val n = docs.length
    // the planted shorts STRADDLE batches: 90001 arrives in batch 1 and
    // its partners in batch 3, so the accumulated short stratum (which
    // has no segment-index rows) must survive across batches to pair them
    val batches = Seq(
      docs.take(n / 3) :+ (90001L, "abc"),
      docs.slice(n / 3 - 10, 2 * n / 3), // re-delivers 10 seen ids
      docs.drop(2 * n / 3) ++ Seq((90002L, "abcd"), (90003L, "zzzzzz")))
    val input = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Int)])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ed-ckpt").toString
    val q = StreamOps.editDistDedupSink(
      input.toDF().toDF("id", "t"), k = 8, checkpoint = ckpt,
      onBatch = (pairs, id) => seen.synchronized {
        seen += id -> pairs.select(col("d1"), col("d2"), col("dist"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      })
    withQuery(q) {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = seen.synchronized(seen.toList).sortBy(_._1)
      assert(got.map(_._1) == List(0L, 1L, 2L))
      val prefixes = batches.inits.toSeq.reverse.drop(1)
        .map(_.flatten.distinctBy(_._1))
      for (((_, streamed), prefix) <- got.zip(prefixes)) {
        val expected = graft.operators.EditDistJoin
          .pairs(prefix.toDF("id", "t"), 8)
          .select(col("d1"), col("d2"), col("dist"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(streamed === expected)
      }
      assert(got.last._2.nonEmpty, "no duplicate pairs surfaced — vacuous fixture")
      // the planted shorts pair (both ≤ k chars) must be present
      assert(got.last._2.exists(p => p._1 == 90001L && p._2 == 90002L))
    }
  }

  test("streaming shortest-path maintenance equals the converged batch distances") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the registered graph_sssp inputs at sf0.001: weighted co-purchase
    // edges + p_size=50 seeds, streamed in three batches — batch 1
    // reversed (canonicalization), batch 2 overlapping batch 1
    // (cross-batch dedup), batch 3 re-sending 40 early edges at weight
    // 1 (the min-merge improvement path: distances must DROP through
    // already-settled regions)
    val so = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk")).distinct()
    val allEdges = so.alias("x")
      .join(so.alias("y"), col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .groupBy(col("x.sk").as("a"), col("y.sk").as("b"))
      .agg((lit(8L) - least(count(lit(1)), lit(7L))).as("w"))
    val rows = allEdges.as[(Long, Long, Long)].collect().toSeq
    val n = rows.length
    val seedIds = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .filter(col("p_size") === 50).select(col("p_partkey")).as[Long].collect().toSeq
    val batches = Seq(
      rows.take(n / 3).map { case (a, b, w) => (b, a, w) },  // reversed
      rows.slice(n / 3 - 50, 2 * n / 3),                     // overlaps prior
      rows.drop(2 * n / 3) ++
        rows.take(40).map { case (a, b, _) => (a, b, 1L) })  // improvements

    /** Sequential min-weight-merged Bellman-Ford to convergence. */
    def reference(arrived: Seq[(Long, Long, Long)]): Map[Long, Long] = {
      val minW = scala.collection.mutable.Map.empty[(Long, Long), Long]
      arrived.foreach { case (x, y, w) =>
        val k = (math.min(x, y), math.max(x, y))
        if (!minW.contains(k) || minW(k) > w) minW(k) = w
      }
      val adj = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
      minW.foreach { case ((a, b), w) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += ((b, w))
        adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += ((a, w))
      }
      val d = scala.collection.mutable.Map.empty[Long, Long]
      seedIds.foreach(d(_) = 0L)
      var changed = true
      while (changed) {
        changed = false
        d.toSeq.foreach { case (v, dv) =>
          adj.getOrElse(v, Nil).foreach { case (nb, w) =>
            if (!d.contains(nb) || d(nb) > dv + w) { d(nb) = dv + w; changed = true }
          }
        }
      }
      d.toMap
    }

    val input = MemoryStream[(Long, Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, Long])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sssp-ckpt").toString
    val q = streaming.StreamOps.shortestPathSink(
      input.toDF().toDF("a", "b", "w"),
      seedIds.toDF("v"), checkpoint = ckpt,
      onBatch = (d, id) => seen.synchronized {
        seen += id -> d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      })
    withQuery(q) {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = seen.synchronized(seen.toList).sortBy(_._1)
      assert(got.map(_._1) == List(0L, 1L, 2L))
      val prefixes = batches.inits.toSeq.reverse.drop(1).map(_.flatten)
      for (((id, streamed), prefix) <- got.zip(prefixes)) {
        assert(streamed === reference(prefix), s"batch $id diverged")
      }
      // the improvement batch must actually move something: at least
      // one node strictly cheaper in batch 2's snapshot than batch 1's
      val before = got(1)._2
      val after = got(2)._2
      assert(after.exists { case (v, d) => before.get(v).exists(_ > d) },
        "weight-improving re-arrivals changed nothing — the min-merge path is untested")
    }
  }

  test("triestTriangleSink: exact when m >= edges; split-invariant and within ε when sampling") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // seeded dense graph: G(60, 0.5) — enough triangle mass for the
    // sub-sample estimate to concentrate, and the deterministic hash
    // priorities make the measured estimate a FIXED number (no flake)
    val rnd = new scala.util.Random(11)
    val allEdges = (for {
      a <- 0 until 60; b <- (a + 1) until 60 if rnd.nextBoolean()
    } yield (a.toLong, b.toLong)).toSeq
    val truth = graft.operators.Triangles
      .triangleRows(allEdges.toDF("a", "b")).count()
    assert(truth > 1000, s"fixture too sparse ($truth triangles) — vacuous")

    def run(m: Int, batches: Seq[Seq[(Long, Long)]]): Seq[(Long, Long, Long, Double)] = {
      val input = MemoryStream[(Long, Long)]
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-triest").toString
      val q = streaming.StreamOps.triestTriangleSink(
        input.toDF().toDF("a", "b"), m, ckpt,
        onBatch = (id, t, s, est) => seen.synchronized { seen += ((id, t, s, est)); () })
      withQuery(q) {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
      }
      seen.synchronized(seen.toList).sortBy(_._1)
    }

    val splitA = allEdges.grouped(math.max(1, allEdges.size / 3)).toSeq
    // a different batching of the same edge set, with reversed
    // orientation on some rows (canonicalization)
    val splitB = allEdges.reverse.map { case (a, b) => (b, a) }
      .grouped(math.max(1, allEdges.size / 5)).toSeq

    // exact regime: the reservoir holds every edge — estimate == truth
    val exact = run(allEdges.size + 10, splitA)
    assert(exact.last._2 == allEdges.size)
    assert(exact.last._4 === truth.toDouble,
      s"m >= t must be exact: ${exact.last._4} vs $truth")

    // sampling regime: declared ε = 30% at m = 400 of ${allEdges.size}
    val estA = run(400, splitA)
    val estB = run(400, splitB)
    assert(estA.last._4 === estB.last._4,
      "bottom-m priority sampling must be invariant under re-batching")
    val err = math.abs(estA.last._4 - truth) / truth
    info(f"TRIÈST estimate ${estA.last._4}%.0f vs truth $truth (err ${err * 100}%.1f%%, m=400/${allEdges.size} edges)")
    assert(err <= 0.3, f"estimate off by ${err * 100}%.1f%% > the declared 30%% at m=400")
  }

  test("annTopKSink unpersists the index when start() itself fails") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = transform(col("embedding"),
      (x: org.apache.spark.sql.Column) => x.cast("double"))
    val data = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), e.as("e"))
    val input = MemoryStream[(Long, Seq[Double])]
    // a checkpoint path that is an existing FILE: start() throws before
    // the termination listener ever registers — the r6-advice leak path
    val badCkpt = java.nio.file.Files.createTempFile("graft-ann-bad-ckpt", "")
    // Assert on THIS index's cache entry, not cacheManager.isEmpty: suites
    // share one session and run concurrently under sbt, so the global
    // cache legitimately holds other suites' frames (the r7 order-dependent
    // flake). Dataset.storageLevel plan-matches against the cache, and the
    // test-unique seed guarantees no other suite caches an equivalent plan.
    val seed = 424242L
    def indexKeys = graft.operators.Ann
      .dataIndex(data, tables = 16, planesPerTable = 5, dim = 64, seed = seed).keys
    assert(indexKeys.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "precondition: this index frame is not cached before the failing start()")
    intercept[Exception] {
      StreamOps.annTopKSink(input.toDF().toDF("vec_id", "e"), data, k = 3,
        seed = seed, checkpoint = badCkpt.toString, onBatch = (_, _) => ())
    }
    assert(indexKeys.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "the 16x-corpus index cache must not leak when start() fails")
  }

  test("stream_ingest: streamed session windows equal the batch run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchDf = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val rows = batchDf.as[Event].collect()

    val input = MemoryStream[Event]
    val q = EventTime.sessions(input.toDF())
      .writeStream.format("memory").queryName("stream_sessions_out")
      .outputMode("complete").start()
    withQuery(q) {
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("stream_sessions_out")
        .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
      val batch = EventTime.sessions(batchDf)
        .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    }
  }

  test("stream_late_data: events behind the watermark are dropped (append mode)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.tumblingWithWatermark(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    withQuery(q) {
      // window [10:00, 11:00): two on-time events
      input.addData(Seq(
        Event(1, ts("2024-01-01 10:05:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 10:40:00"), 1, "view", 2.0)))
      q.processAllAvailable()
      // advance watermark past 11:00 (max ts 11:30 − 10 min = 11:20)
      input.addData(Seq(Event(3, ts("2024-01-01 11:30:00"), 1, "view", 3.0)))
      q.processAllAvailable()
      // late event for the already-closed 10:00 window → must be dropped
      input.addData(Seq(Event(4, ts("2024-01-01 10:15:00"), 1, "view", 99.0)))
      q.processAllAvailable()
      // flush: push watermark far ahead so the 11:00 window also emits
      input.addData(Seq(Event(5, ts("2024-01-01 13:00:00"), 1, "view", 5.0)))
      q.processAllAvailable()

      val out = spark.table("late_out")
        .select(col("wstart").cast("string"), col("n"), col("total").cast("string"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap

      // 10:00 window: ONLY the two on-time events — the late 99.0 is gone.
      // (total is DOUBLE since the Oracle.out representation cast.)
      assert(out("2024-01-01 10:00:00") == ((2L, "3.0")))
      // 11:00 window: the 11:30 event; late event created no resurrection.
      assert(out("2024-01-01 11:00:00") == ((1L, "3.0")))
    }
  }

  test("foreachBatch sink: every micro-batch lands exactly once in parquet") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-fb").toString
    val input = MemoryStream[Event]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .start()
    withQuery(q) {
      input.addData(Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0)))
      q.processAllAvailable()
      input.addData(Seq(
        Event(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 10:02:00"), 2, "click", 3.0)))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir)
      assert(out.count() === 3)
      assert(out.select(countDistinct(col("batch_id"))).head.getLong(0) === 2)
      assert(out.select(sum(col("value"))).head.getDouble(0) === 6.0)
    }
  }

  test("stream_join: stream-stream interval join matches batch, state bounded") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.errorClickJoin(input.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("join_out")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:04:00"), 7, "click", 1.0),
        Event(3, ts("2024-01-01 10:05:00"), 7, "error", 0.0), // joins 1,2
        Event(4, ts("2024-01-01 10:04:30"), 8, "click", 1.0),
        Event(5, ts("2024-01-01 10:20:00"), 8, "error", 0.0), // click too old
        Event(6, ts("2024-01-01 10:06:00"), 9, "error", 0.0))) // no click
      q.processAllAvailable()
      // push both watermarks far ahead so all joinable pairs emit
      input.addData(Seq(
        Event(7, ts("2024-01-01 12:00:00"), 7, "click", 1.0),
        Event(8, ts("2024-01-01 12:00:00"), 7, "error", 0.0)))
      q.processAllAvailable()
      val out = spark.table("join_out")
        .select(col("err_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out === Set((3L, 1L), (3L, 2L), (8L, 7L)))
      // the batch form of the same join agrees (same condition, no state)
      val batch = StreamOps.errorClickJoin(
        spark.createDataset(Seq(
          Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
          Event(2, ts("2024-01-01 10:04:00"), 7, "click", 1.0),
          Event(3, ts("2024-01-01 10:05:00"), 7, "error", 0.0),
          Event(4, ts("2024-01-01 10:04:30"), 8, "click", 1.0),
          Event(5, ts("2024-01-01 10:20:00"), 8, "error", 0.0),
          Event(6, ts("2024-01-01 10:06:00"), 9, "error", 0.0),
          Event(7, ts("2024-01-01 12:00:00"), 7, "click", 1.0),
          Event(8, ts("2024-01-01 12:00:00"), 7, "error", 0.0))).toDF())
        .select(col("err_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === out)
    }
  }

  test("left-outer stream-stream join emits unmatched errors after the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.errorClickJoinLeft(input.toDF())
      .writeStream.format("memory").queryName("left_join_out")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 7, "error", 0.0), // matched
        Event(3, ts("2024-01-01 10:06:00"), 9, "error", 0.0)  // no clicks
      ))
      q.processAllAvailable()
      // matched row emits promptly; the unmatched one needs the GLOBAL
      // watermark (min of BOTH sides under the default policy) to pass
      // err_ts + window — so both the click AND error watermark nodes
      // must see late events before the join state can expire
      input.addData(Seq(
        Event(4, ts("2024-01-01 11:00:00"), 8, "click", 1.0),
        Event(5, ts("2024-01-01 11:00:00"), 98, "error", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(
        Event(6, ts("2024-01-01 11:00:01"), 8, "click", 1.0),
        Event(7, ts("2024-01-01 11:00:01"), 98, "error", 0.0)))
      q.processAllAvailable()
      val rows = spark.table("left_join_out")
        .filter(col("err_id") <= 3) // the watermark-advancer errors expire later
        .select(col("err_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows === Set((2L, 1L), (3L, -1L)),
        s"expected matched (2,1) and null-joined (3,-1): $rows")
    }
  }

  test("flatMapGroupsWithState carries per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("totals_out")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.5),
        Event(2, ts("2024-01-01 10:01:00"), 7, "view", 2.5),
        Event(3, ts("2024-01-01 10:02:00"), 9, "view", 10.0)))
      q.processAllAvailable()
      input.addData(Seq(Event(4, ts("2024-01-01 10:03:00"), 7, "view", 6.0)))
      q.processAllAvailable()
      val rows = spark.table("totals_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // batch 1 emissions: user 7 → (2, 4.0), user 9 → (1, 10.0)
      // batch 2 emission:  user 7 → (3, 10.0) — state carried over
      assert(rows == Set((7L, 2L, 4.0), (9L, 1L, 10.0), (7L, 3L, 10.0)))
    }
  }

  test("event-time timers close sessions when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = StreamOps.sessionClose(input.toDS(), gap = "1 minute")
        .writeStream.format("memory").queryName("session_close_out")
        .outputMode("append").start()
      withQuery(q) {
        input.addData(Seq(
          Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
          Event(2, ts("2024-01-01 10:00:30"), 7, "view", 1.0),
          Event(3, ts("2024-01-01 10:00:10"), 9, "view", 1.0)))
        q.processAllAvailable()
        // sessions still open: watermark hasn't passed last+gap
        assert(spark.table("session_close_out").isEmpty)
        // a much later event advances the max event time...
        input.addData(Seq(Event(4, ts("2024-01-01 10:10:00"), 99, "view", 1.0)))
        q.processAllAvailable()
        // ...and the NEXT batch runs with the advanced watermark, firing
        // the expired timers for users 7 and 9
        input.addData(Seq(Event(5, ts("2024-01-01 10:10:01"), 99, "view", 1.0)))
        q.processAllAvailable()
        val closed = spark.table("session_close_out")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(closed.get(7L).contains(2L), s"user 7 session wrong: $closed")
        assert(closed.get(9L).contains(1L), s"user 9 session wrong: $closed")
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("session timer re-arms across micro-batches: extended session closes once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = StreamOps.sessionClose(input.toDS(), gap = "1 minute")
        .writeStream.format("memory").queryName("session_rearm_out")
        .outputMode("append").start()
      withQuery(q) {
        input.addData(Seq(
          Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
          Event(2, ts("2024-01-01 10:00:30"), 7, "view", 1.0)))
        q.processAllAvailable()
        // same key in a SECOND micro-batch: handleInputRows must delete
        // the batch-1 timer (the mutate-under-iterator path) and re-arm
        // at the new session end
        input.addData(Seq(Event(3, ts("2024-01-01 10:00:50"), 7, "view", 1.0)))
        q.processAllAvailable()
        assert(spark.table("session_rearm_out").isEmpty)
        // advance the watermark far past both armed times; if the stale
        // batch-1 timer survived, the session would close at 10:01:30
        // with n=2 (or twice) instead of once at 10:01:50 with n=3
        input.addData(Seq(Event(4, ts("2024-01-01 10:10:00"), 99, "view", 1.0)))
        q.processAllAvailable()
        input.addData(Seq(Event(5, ts("2024-01-01 10:10:01"), 99, "view", 1.0)))
        q.processAllAvailable()
        val closed = spark.table("session_rearm_out")
          .filter(col("user_id") === 7L)
          .collect().map(r => (r.getLong(1), r.getTimestamp(3).getTime))
        assert(closed.toSeq == Seq((3L, ts("2024-01-01 10:00:50").getTime)),
          s"user 7 must close exactly once with the extended session: ${closed.toSeq}")
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState (RocksDB store) matches flatMapGroupsWithState semantics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = StreamOps.runningUserTotalsTws(input.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("append").start()
      withQuery(q) {
        input.addData(Seq(
          Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.5),
          Event(2, ts("2024-01-01 10:01:00"), 7, "view", 2.5),
          Event(3, ts("2024-01-01 10:02:00"), 9, "view", 10.0)))
        q.processAllAvailable()
        input.addData(Seq(Event(4, ts("2024-01-01 10:03:00"), 7, "view", 6.0)))
        q.processAllAvailable()
        val rows = spark.table("tws_out")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(rows == Set((7L, 2L, 4.0), (9L, 1L, 10.0), (7L, 3L, 10.0)))
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming grid resample emits closed hours with LOCF gap rows (ts_resample form)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = StreamOps.gridResample(input.toDS())
        .writeStream.format("memory").queryName("grid_resample_out")
        .outputMode("append").start()
      withQuery(q) {
        // user 7: events in hours 10:00 (two) and 13:00 (one) — gaps at
        // 11:00 and 12:00; split across micro-batches so the 10:00 hour
        // is still open after batch 1
        input.addData(Seq(
          Event(1, ts("2024-01-01 10:05:00"), 7, "view", 1.5),
          Event(2, ts("2024-01-01 10:40:00"), 7, "view", 2.5)))
        q.processAllAvailable()
        assert(spark.table("grid_resample_out").isEmpty,
          "hour 10:00 emitted before the watermark closed it")
        input.addData(Seq(Event(3, ts("2024-01-01 13:10:00"), 7, "view", 6.0)))
        q.processAllAvailable()
        // advance the watermark past 14:00 (sentinel user), then one more
        // batch so the expired timers run with the advanced watermark
        input.addData(Seq(Event(4, ts("2024-01-01 15:00:00"), 99, "view", 1.0)))
        q.processAllAvailable()
        input.addData(Seq(Event(5, ts("2024-01-01 15:00:01"), 99, "view", 1.0)))
        q.processAllAvailable()
        val rows = spark.table("grid_resample_out")
          .filter(col("user_id") === 7L)
          .orderBy("hour")
          .collect()
          .map(r => (r.getTimestamp(1), Option(r.get(2)), r.getLong(3),
            r.getBoolean(4), r.getDouble(5)))
          .toSeq
        // same shape the batch ts_resample query produces for this user:
        // grid [10:00 .. 13:00], means exact, gaps LOCF-filled
        assert(rows == Seq(
          (ts("2024-01-01 10:00:00"), Some(2.0), 2L, false, 2.0),
          (ts("2024-01-01 11:00:00"), None, 0L, true, 2.0),
          (ts("2024-01-01 12:00:00"), None, 0L, true, 2.0),
          (ts("2024-01-01 13:00:00"), Some(6.0), 1L, false, 6.0)),
          s"grid mismatch: $rows")
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream_dedup: dropDuplicatesWithinWatermark keeps first arrival only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.dedupWithinWatermark(input.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Event(1, ts("2024-01-01 10:00:30"), 1, "view", 1.0), // same batch dup
        Event(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0)))
      q.processAllAvailable()
      input.addData(Seq(
        Event(2, ts("2024-01-01 10:02:00"), 1, "view", 2.0), // cross-batch dup
        Event(3, ts("2024-01-01 10:03:00"), 1, "view", 3.0)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    }
  }

  test("streaming interval merge matches the batch win_interval_merge semantics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = StreamOps.intervalMerge(input.toDS(), span = "5 minutes")
        .writeStream.format("memory").queryName("interval_merge_out")
        .outputMode("append").start()
      withQuery(q) {
        // out-of-order WITHIN the batch: 10:03 arrives before 10:00; the
        // two merge (gap 3 min < 5 min span); 10:30 is disjoint; user 2
        // independent. Touch/overlap semantics identical to the batch
        // query: spans [ts, ts+5min), s <= running max end merges.
        input.addData(Seq(
          Event(1, ts("2024-01-01 10:03:00"), 1, "view", 1.0),
          Event(2, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
          Event(3, ts("2024-01-01 10:30:00"), 1, "view", 1.0),
          Event(4, ts("2024-01-01 11:00:00"), 2, "view", 1.0)))
        q.processAllAvailable()
        // watermark (max 11:00 − 1s) passed 10:08 and 10:35: user 1's
        // two intervals close on the timer; user 2's is still open
        input.addData(Seq(Event(5, ts("2024-01-01 12:00:00"), 99, "view", 1.0)))
        q.processAllAvailable()
        input.addData(Seq(Event(6, ts("2024-01-01 12:00:01"), 99, "view", 1.0)))
        q.processAllAvailable()
        val out = spark.table("interval_merge_out")
          .select(col("user_id"), col("merged_start").cast("string"),
            col("merged_end").cast("string"), col("n_events"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
          .toSet
        // exactly the batch result on the same (non-sentinel) events
        assert(out == Set(
          (1L, "2024-01-01 10:00:00", "2024-01-01 10:08:00", 2L),
          (1L, "2024-01-01 10:30:00", "2024-01-01 10:35:00", 1L),
          (2L, "2024-01-01 11:00:00", "2024-01-01 11:05:00", 1L)),
          s"streamed intervals diverge from batch semantics: $out")
        // the sentinel user's interval is still open — emission is
        // final-only, nothing speculative leaked
        assert(!out.exists(_._1 == 99L))
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming interval merge: a swallowed span cannot reopen a closed interval") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = StreamOps.intervalMerge(input.toDS(), span = "5 minutes")
        .writeStream.format("memory").queryName("interval_merge_out2")
        .outputMode("append").start()
      withQuery(q) {
        // same-batch chain: 10:00, 10:04, 10:08 — each extends the
        // running max end (final end 10:13); count 3, ONE interval
        input.addData(Seq(
          Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
          Event(2, ts("2024-01-01 10:04:00"), 1, "view", 1.0),
          Event(3, ts("2024-01-01 10:08:00"), 1, "view", 1.0)))
        q.processAllAvailable()
        input.addData(Seq(Event(4, ts("2024-01-01 11:00:00"), 99, "view", 1.0)))
        q.processAllAvailable()
        input.addData(Seq(Event(5, ts("2024-01-01 11:00:01"), 99, "view", 1.0)))
        q.processAllAvailable()
        val out = spark.table("interval_merge_out2")
          .select(col("user_id"), col("merged_start").cast("string"),
            col("merged_end").cast("string"), col("n_events"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
          .toSet
        assert(out == Set((1L, "2024-01-01 10:00:00", "2024-01-01 10:13:00", 3L)), s"$out")
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming quality scorer equals the batch scorer per micro-batch") {
    // The serving half of quality_lr at ingest time: QualityScorer.score
    // is stateless and row-local, so the IDENTICAL transform runs over
    // the stream (stream-static broadcast weight join) — stream ≡ batch
    // by construction, verified here across two micro-batches against
    // the batch scorer on exactly those rows.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .limit(40)
      .as[(Long, String)].collect()
    val w = graft.queries.Extra6.LrW
    val weights = spark.range(1).select(
      lit(w(0)).as("w0"), lit(w(1)).as("w1"),
      lit(w(2)).as("w2"), lit(w(3)).as("w3"))

    val input = MemoryStream[(Long, String)]
    val q = graft.operators.QualityScorer
      .score(input.toDF().toDF("doc_id", "text"), weights)
      .writeStream.format("memory").queryName("lr_score_out")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(docs.take(20).toSeq)
      q.processAllAvailable()
      val afterFirst = spark.table("lr_score_out").count()
      input.addData(docs.drop(20).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("lr_score_out")
        .collect().map(_.toSeq).toSet
      val batch = graft.operators.QualityScorer
        .score(docs.toSeq.toDF("doc_id", "text"), weights)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, "stream and batch scorer disagree")
      assert(afterFirst > 0 && afterFirst < streamed.size,
        "expected append-mode incremental emission across micro-batches")
    }
  }
}
