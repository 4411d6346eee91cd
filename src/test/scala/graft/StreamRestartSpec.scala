package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Restart-correct streaming state (round-16 verdict #2): with a
  * `stateDir`, the scd2 and TRIÈST accumulator sinks must survive a
  * FULL teardown — stop the query AND abandon the session — and, after
  * restarting against the same checkpoint + state dir, converge
  * byte-equal to the uninterrupted run. The source is a parquet FILE
  * stream (replayable from the checkpoint, unlike MemoryStream — the
  * restart is real: batch ids continue, only new files are delivered),
  * and the restarted query runs in a `newSession()` so no driver-local
  * state can leak across the restart: the StreamState artifact is the
  * only carrier.
  */
class StreamRestartSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("scd2Sink with stateDir: teardown after batch 2, restart, batch 3 equals the uninterrupted rebuild") {
    import spark.implicits._
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$s%02d")
    val b1 = Seq((1L, t(1), 1L, "A"), (1L, t(3), 3L, "B"),
      (2L, t(1), 6L, "X"), (2L, t(2), 7L, "Y"))
    val b2 = Seq((1L, t(5), 5L, "C"))      // extends user 1
    val b3 = Seq((1L, t(4), 4L, "A"),      // LATE: splits B's range
      (3L, t(9), 9L, "Z"))                 // new entity after restart
    val in = tmp("scd2r-in"); val ckpt = tmp("scd2r-ckpt")
    val state = tmp("scd2r-state")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("event_type", StringType)))
    val cols = Seq("user_id", "ts", "event_id", "event_type")
    def addFile(n: Int, rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit =
      rows.toDF(cols: _*).coalesce(1).write.parquet(s"$in/f$n")

    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "version").collect().map(r => (
        r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3),
        Option(r.getTimestamp(4)), r.getBoolean(5))).toSeq

    // ---- run 1 (session A): batches 1 and 2, then FULL teardown --------
    val sA = spark.newSession()
    val seenA = scala.collection.mutable.Map[Long, Seq[Any]]()
    addFile(1, b1)
    val qA = graft.streaming.StreamOps.scd2Sink(
      sA.readStream.schema(schema).parquet(s"$in/f*"), ckpt,
      onBatch = (dim, id) => seenA.synchronized { seenA += id -> rowsOf(dim) },
      stateDir = Some(state))
    try {
      qA.processAllAvailable()
      addFile(2, b2)
      qA.processAllAvailable()
      assert(seenA.keySet === Set(0L, 1L))
    } finally qA.stop()

    // ---- run 2 (session B): same checkpoint + state, batch 3 -----------
    val sB = spark.newSession()
    var finalDim: Seq[Any] = Nil
    var batchesB = List.empty[Long]
    addFile(3, b3)
    val qB = graft.streaming.StreamOps.scd2Sink(
      sB.readStream.schema(schema).parquet(s"$in/f*"), ckpt,
      onBatch = (dim, id) => { batchesB ::= id; finalDim = rowsOf(dim) },
      stateDir = Some(state))
    try qB.processAllAvailable() finally qB.stop()
    // the checkpoint resumed: ONLY the new file arrived, as batch 2
    assert(batchesB === List(2L), s"expected only batch 2, got $batchesB")
    // byte-equal to the uninterrupted rebuild over all events
    val expected = rowsOf(graft.operators.Merge.scd2Dim(
      (b1 ++ b2 ++ b3).toDF(cols: _*)))
    assert(finalDim === expected,
      "restarted snapshot diverged from the uninterrupted rebuild")
    // the late event DID split mid-history across the restart boundary
    assert(expected.collect { case x: (Long, Long, String, _, _, _) @unchecked
      if x._1 == 1L => x._3 } === Seq("A", "B", "A", "C"))
  }

  test("triestTriangleSink with stateDir: teardown after batch 2, restart, estimates equal the uninterrupted run") {
    import spark.implicits._
    // K6 on nodes 1..6 delivered once each across three batches: 15
    // edges, 20 true triangles; m large enough to hold everything so
    // the estimate is EXACT and any state loss is immediately visible
    val all = for {
      a <- 1L to 6L; b <- (a + 1) to 6L
    } yield (a, b)
    val (b1, rest) = all.splitAt(5)
    val (b2, b3) = rest.splitAt(5)
    val in = tmp("triest-in"); val ckpt = tmp("triest-ckpt")
    val state = tmp("triest-state")
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    def addFile(n: Int, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("a", "b").coalesce(1).write.parquet(s"$in/f$n")

    // ---- interrupted run ------------------------------------------------
    val sA = spark.newSession()
    val got = scala.collection.mutable.Map[Long, (Long, Long, Double)]()
    addFile(1, b1)
    val qA = graft.streaming.StreamOps.triestTriangleSink(
      sA.readStream.schema(schema).parquet(s"$in/f*"), m = 40, ckpt,
      onBatch = (id, t, tri, est) =>
        got.synchronized { got += id -> ((t, tri, est)) },
      stateDir = Some(state))
    try {
      qA.processAllAvailable()
      addFile(2, b2)
      qA.processAllAvailable()
    } finally qA.stop()

    val sB = spark.newSession()
    addFile(3, b3)
    val qB = graft.streaming.StreamOps.triestTriangleSink(
      sB.readStream.schema(schema).parquet(s"$in/f*"), m = 40, ckpt,
      onBatch = (id, t, tri, est) =>
        got.synchronized { got += id -> ((t, tri, est)) },
      stateDir = Some(state))
    try qB.processAllAvailable() finally qB.stop()

    // t accumulated ACROSS the restart; m ≥ t ⇒ exact count of K6
    assert(got(2L) === ((15L, 20L, 20.0)),
      s"restart lost reservoir/t state: ${got.toMap}")

    // ---- uninterrupted reference (same batches, one run) ---------------
    val in2 = tmp("triest-in2"); val ckpt2 = tmp("triest-ckpt2")
    val sC = spark.newSession()
    val got2 = scala.collection.mutable.Map[Long, (Long, Long, Double)]()
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      b.toDF("a", "b").coalesce(1).write.parquet(s"$in2/f${i + 1}") }
    val qC = graft.streaming.StreamOps.triestTriangleSink(
      sC.readStream.schema(schema).parquet(s"$in2/f*"), m = 40, ckpt2,
      onBatch = (id, t, tri, est) =>
        got2.synchronized { got2 += id -> ((t, tri, est)) })
    try qC.processAllAvailable() finally qC.stop()
    // the uninterrupted run may batch the 3 pre-existing files its own
    // way; compare the FINAL cumulative numbers
    assert(got2.values.maxBy(_._1) === got(2L),
      "interrupted and uninterrupted runs diverged")
  }

  test("triangleCountSink with stateDir: restart preserves exact cumulative counts") {
    import spark.implicits._
    val all = (for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b))
    val (b1, rest) = all.splitAt(5); val (b2, b3) = rest.splitAt(5)
    val in = tmp("tcr-in"); val ckpt = tmp("tcr-ckpt"); val state = tmp("tcr-state")
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType)))
    def addFile(n: Int, rows: Seq[(Long, Long)]): Unit =
      rows.toDF("a", "b").coalesce(1).write.parquet(s"$in/f$n")
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val sA = spark.newSession()
    var last: Seq[(Long, Long)] = Nil
    addFile(1, b1)
    val qA = graft.streaming.StreamOps.triangleCountSink(
      sA.readStream.schema(schema).parquet(s"$in/f*"), ckpt,
      onBatch = (df, _) => last = counts(df), stateDir = Some(state))
    try { qA.processAllAvailable(); addFile(2, b2); qA.processAllAvailable() }
    finally qA.stop()

    val sB = spark.newSession()
    addFile(3, b3)
    val qB = graft.streaming.StreamOps.triangleCountSink(
      sB.readStream.schema(schema).parquet(s"$in/f*"), ckpt,
      onBatch = (df, _) => last = counts(df), stateDir = Some(state))
    try qB.processAllAvailable() finally qB.stop()
    // K6: every node is in C(5,2) = 10 triangles
    assert(last === (1L to 6L).map(v => (v, 10L)),
      s"restart lost triangle state: $last")
  }

  test("shortestPathSink with stateDir: restart preserves converged distances") {
    import spark.implicits._
    // path 1 -2- 2 -3- 3 -1- 4 delivered across a restart, plus a
    // cheaper re-arrival for (1,2) AFTER the restart (weight-improving)
    val b1 = Seq((1L, 2L, 5L))
    val b2 = Seq((2L, 3L, 3L))
    val b3 = Seq((3L, 4L, 1L), (1L, 2L, 2L))
    val in = tmp("spr-in"); val ckpt = tmp("spr-ckpt"); val state = tmp("spr-state")
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType), StructField("w", LongType)))
    def addFile(n: Int, rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("a", "b", "w").coalesce(1).write.parquet(s"$in/f$n")
    def dists(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val seedsA = Seq(1L)
    val sA = spark.newSession()
    var last: Seq[(Long, Long)] = Nil
    addFile(1, b1)
    val qA = graft.streaming.StreamOps.shortestPathSink(
      sA.readStream.schema(schema).parquet(s"$in/f*"),
      seedsA.toDF("v"), ckpt,
      onBatch = (df, _) => last = dists(df), stateDir = Some(state))
    try { qA.processAllAvailable(); addFile(2, b2); qA.processAllAvailable() }
    finally qA.stop()
    assert(last === Seq((1L, 0L), (2L, 5L), (3L, 8L)))

    val sB = spark.newSession()
    addFile(3, b3)
    val qB = graft.streaming.StreamOps.shortestPathSink(
      sB.readStream.schema(schema).parquet(s"$in/f*"),
      seedsA.toDF("v"), ckpt,
      onBatch = (df, _) => last = dists(df), stateDir = Some(state))
    try qB.processAllAvailable() finally qB.stop()
    // the improved (1,2)=2 must re-relax the whole downstream chain
    assert(last === Seq((1L, 0L), (2L, 2L), (3L, 5L), (4L, 6L)),
      s"restart lost shortest-path state: $last")
  }

  test("editDistDedupSink with stateDir: restart preserves docs, segments and pairs") {
    import spark.implicits._
    val b1 = Seq((1L, "kitten"), (2L, "sitten"))
    val b2 = Seq((3L, "mitten"))
    val b3 = Seq((4L, "sittin"), (5L, "unrelatedword"))
    val in = tmp("edr-in"); val ckpt = tmp("edr-ckpt"); val state = tmp("edr-state")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("t", StringType)))
    def addFile(n: Int, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "t").coalesce(1).write.parquet(s"$in/f$n")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "dist").orderBy("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val sA = spark.newSession()
    var last: Set[(Long, Long, Int)] = Set.empty
    addFile(1, b1)
    val qA = graft.streaming.StreamOps.editDistDedupSink(
      sA.readStream.schema(schema).parquet(s"$in/f*"), k = 2, ckpt,
      onBatch = (df, _) => last = pairs(df), stateDir = Some(state))
    try { qA.processAllAvailable(); addFile(2, b2); qA.processAllAvailable() }
    finally qA.stop()

    val sB = spark.newSession()
    addFile(3, b3)
    val qB = graft.streaming.StreamOps.editDistDedupSink(
      sB.readStream.schema(schema).parquet(s"$in/f*"), k = 2, ckpt,
      onBatch = (df, _) => last = pairs(df), stateDir = Some(state))
    try qB.processAllAvailable() finally qB.stop()
    // equals the batch operator over ALL docs — pairs found across the
    // restart boundary (4 vs 1/2/3) prove the segment index survived
    val expected = pairs(graft.operators.EditDistJoin.pairs(
      (b1 ++ b2 ++ b3).toDF("id", "t"), 2))
    assert(last === expected, s"restart lost edit-dist state")
    assert(last.exists { case (d1, d2, _) => d2 == 4L && d1 < 4L },
      "no cross-restart pair found — the index did not survive")
  }

  test("StreamState prunes superseded versions: exactly TWO versions on disk after many batches") {
    import spark.implicits._
    val sd = tmp("prune-state")
    val s = spark.newSession()
    for (b <- 0L to 3L)
      graft.streaming.StreamState.write(s, sd, b,
        Seq("x" -> Seq((b, b)).toDF("a", "b")), Seq("t" -> b))
    // two newest committed versions retained: v3 (current) and v2 (the
    // crash-window restore target) — pruning down to one would orphan
    // the strictly-below restore exactly when a crash re-delivers v3
    val vs = new java.io.File(sd).listFiles().map(_.getName).sorted.toSeq
    assert(vs === Seq("v2", "v3"), s"expected the two newest versions: $vs")
    assert(graft.streaming.StreamState.latest(s, sd, Long.MaxValue) === Some(3L))
    assert(graft.streaming.StreamState.latest(s, sd, 3L) === Some(2L),
      "re-delivered batch 3 must restore v2, not start empty")
  }

  test("StreamState crash window: re-delivered last batch restores the predecessor state") {
    import spark.implicits._
    val sd = tmp("crash-state")
    val s = spark.newSession()
    // run: batches 1 and 2 commit state; then the engine crashes AFTER
    // StreamState.write(v2) but BEFORE the streaming offset commit —
    // nothing else happens on disk, so this sequence IS the crash
    graft.streaming.StreamState.write(s, sd, 1L,
      Seq("x" -> Seq((1L, 10L)).toDF("a", "b")), Seq("t" -> 1L))
    graft.streaming.StreamState.write(s, sd, 2L,
      Seq("x" -> Seq((2L, 20L)).toDF("a", "b")), Seq("t" -> 2L))
    // restart: the engine re-delivers batch 2; the sink must restore
    // v1 (strictly below), recompute, and overwrite v2 idempotently
    val v = graft.streaming.StreamState.latest(s, sd, 2L)
    assert(v === Some(1L),
      s"crash-window restore lost state: latest(2) = $v (ADVICE r18 high)")
    assert(graft.streaming.StreamState.meta(s, sd, 1L)("t") === 1L)
    assert(graft.streaming.StreamState
      .frame(s, sd, 1L, "x").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq === Seq((1L, 10L)))
    // the idempotent re-commit of v2 then prunes nothing it needs
    graft.streaming.StreamState.write(s, sd, 2L,
      Seq("x" -> Seq((2L, 20L)).toDF("a", "b")), Seq("t" -> 2L))
    assert(graft.streaming.StreamState.latest(s, sd, 3L) === Some(2L))
  }
}
