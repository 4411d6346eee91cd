package graft

import graft.operators.{Merge, Packing, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC merge, exact-k sampling and sequence-packing operator semantics
  * (the queries.Pipeline surface is oracle-checked end-to-end; these
  * pin the operator-level contracts and the one-shuffle merge plan).
  */
class MergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "status", "price")

  test("upsert: change rows replace base rows, new keys insert, rest pass through") {
    val changes = Seq(
      (2L, "B", 21.0, 1L), // replaces key 2
      (9L, "Z", 90.0, 1L)  // inserts key 9
    ).toDF("k", "status", "price", "v")
    val out = Merge.upsert(base, changes, Seq("k"), col("v"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, "a", 10.0), (2L, "B", 21.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (9L, "Z", 90.0)))
  }

  test("versioned conflicts: the highest version wins within a key") {
    val changes = Seq(
      (2L, "v1", 1.0, 1L), (2L, "v3", 3.0, 3L), (2L, "v2", 2.0, 2L)
    ).toDF("k", "status", "price", "v")
    val out = Merge.upsert(base, changes, Seq("k"), col("v"))
      .filter(col("k") === 2L).as[(Long, String, Double)].collect()
    assert(out.toSeq === Seq((2L, "v3", 3.0)))
  }

  test("tombstones delete keys; a later upsert resurrects them") {
    val changes = Seq(
      (1L, "x", 0.0, 1L, "D"),  // delete key 1
      (3L, "x", 0.0, 1L, "D"),  // delete key 3 ...
      (3L, "C2", 33.0, 2L, "U") // ... but v2 re-inserts it
    ).toDF("k", "status", "price", "v", "op")
    val out = Merge.applyCdc(base, changes, Seq("k"), col("v"), "op", "D")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq === Seq(
      (2L, "b", 20.0), (3L, "C2", 33.0), (4L, "d", 40.0)))
  }

  test("a NULL op value is an upsert, not a silent drop") {
    val changes = Seq(
      (2L, "B", 21.0, 1L, null.asInstanceOf[String]), // null op → upsert
      (5L, "E", 50.0, 1L, null.asInstanceOf[String]), // null op, new key → insert
      (3L, "x", 0.0, 1L, "D")                          // real delete still works
    ).toDF("k", "status", "price", "v", "op")
    val out = Merge.applyCdc(base, changes, Seq("k"), col("v"), "op", "D")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0), (5L, "E", 50.0)))
  }

  test("merge plans exactly one shuffle (union is map-side)") {
    val changes = Seq((2L, "B", 21.0, 1L)).toDF("k", "status", "price", "v")
    val merged = Merge.upsert(base, changes, Seq("k"), col("v"))
    merged.collect()
    // AQE's toString prints Final AND Initial sections — count only Final
    val plan = merged.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 1, s"expected 1 shuffle, got $shuffles:\n$plan")
  }

  test("changes missing a base column are rejected") {
    val bad = Seq((2L, "B", 1L)).toDF("k", "status", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(base, bad, Seq("k"), col("v"))
    }
    assert(e.getMessage.contains("must contain every base column"))
  }

  test("stratifiedK returns exactly k rows per stratum, stable across partitionings") {
    val df = (0L until 100L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val a = Sampling.stratifiedK(df, Seq(col("lang")), col("id"), 5)
      .select("lang", "rk", "id").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(a.size === 15)
    assert(a.groupBy(_._1).forall(_._2.size == 5))
    val b = Sampling.stratifiedK(df.repartition(7), Seq(col("lang")), col("id"), 5)
      .select("lang", "rk", "id").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b, "sample must be partitioning-invariant")
  }

  test("applyCdc agrees with a sequential per-key model on random changesets") {
    // Model: replay changes per key in version order over a Map — the
    // obviously-correct single-threaded semantics the distributed
    // operator must reproduce.
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { round =>
      val baseRows = (0L until 30L).map(k => (k, s"b$k", k * 1.0))
      val nCh = 40
      val changes = (0 until nCh).map { i =>
        val k = rnd.nextInt(40).toLong // some keys beyond base → inserts
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        (k, s"c$i", i * 1.0, i.toLong /* unique version */, op)
      }
      val model = scala.collection.mutable.Map[Long, (String, Double)]()
      baseRows.foreach { case (k, s, p) => model(k) = (s, p) }
      changes.groupBy(_._1).foreach { case (k, ch) =>
        val last = ch.maxBy(_._4) // highest version wins per key
        if (last._5 == "D") model.remove(k)
        else model(k) = (last._2, last._3)
      }
      val out = Merge.applyCdc(
          baseRows.toDF("k", "status", "price"),
          changes.toDF("k", "status", "price", "v", "op"),
          Seq("k"), col("v"), "op", "D")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
      assert(out === model.toMap, s"round $round diverged from the model")
    }
  }

  test("packBySize boundary rule holds on random streams (model equality)") {
    val rnd = new scala.util.Random(7)
    val budget = 100L
    val docs = (0L until 200L).map(i => (i, i % 3, 1L + rnd.nextInt(150).toLong))
    val out = Packing.packBySize(docs.toDF("doc_id", "stream", "n"),
        col("n"), Seq(col("stream")), Seq(col("doc_id")), budget)
      .select("stream", "doc_id", "start_tok", "pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // model: exclusive running sum per stream in doc_id order
    val model = docs.groupBy(_._2).flatMap { case (st, ds) =>
      var acc = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        val start = acc; acc += n
        (st, id, start, start / budget)
      }
    }.toSet
    assert(out.toSet === model)
    // pack ids are monotone non-decreasing along each stream
    out.groupBy(_._1).values.foreach { rows =>
      val ordered = rows.sortBy(_._2).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    }
  }

  test("cdcMergeSink maintains a snapshot across micro-batches (upsert, version, delete)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val input = MemoryStream[(Long, String, Double, Long, String)]
    val changes = input.toDF().toDF("k", "status", "price", "v", "op")
    val q = graft.streaming.StreamOps.cdcMergeSink(changes,
      s"$dir/snap", Seq("k"), "v", "op", "D", s"$dir/ckpt")
    try {
      input.addData(Seq((1L, "a", 10.0, 1L, "U"), (2L, "b", 20.0, 1L, "U")))
      q.processAllAvailable()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("price", org.apache.spark.sql.types.DoubleType)))
      def snap() = graft.streaming.StreamOps.readSnapshot(spark, s"$dir/snap", schema)
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(snap() === Seq((1L, "a", 10.0), (2L, "b", 20.0)))
      // batch 2: update k=2 (v2), delete k=1, insert k=3
      input.addData(Seq(
        (2L, "B", 22.0, 2L, "U"), (1L, "x", 0.0, 2L, "D"), (3L, "c", 30.0, 1L, "U")))
      q.processAllAvailable()
      assert(snap() === Seq((2L, "B", 22.0), (3L, "c", 30.0)))
      // the pointer resolves to the batch-1 snapshot
      val latest = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/snap", "LATEST")).trim
      assert(latest === "snap_1")
      // a third batch triggers retention: snap_0 (two generations old)
      // is deleted, snap_1 (previous) kept for concurrent readers
      input.addData(Seq((4L, "d", 40.0, 1L, "U")))
      q.processAllAvailable()
      val snaps = new java.io.File(s"$dir/snap").listFiles()
        .map(_.getName).filter(_.startsWith("snap_")).sorted.toSeq
      assert(snaps === Seq("snap_1", "snap_2"), s"retention failed: $snaps")
      assert(snap() === Seq((2L, "B", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    } finally q.stop()
  }

  test("scd2Sink: a late event splits a mid-history range and the snapshot converges to the batch rebuild") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$s%02d")
    // user 1: A(t1) A(t2) B(t3) C(t5) on time; the LATE e4 = A at t4
    // lands BETWEEN B(t3) and C(t5) — it must split the B run's
    // [t3, t5) range and renumber version 3
    val b1 = Seq((1L, t(1), 1L, "A"), (1L, t(2), 2L, "A"),
      (1L, t(3), 3L, "B"), (1L, t(5), 5L, "C"),
      (2L, t(1), 6L, "X"), (2L, t(2), 7L, "Y")) // user 2: untouched later
    val b2 = Seq((1L, t(4), 4L, "A")) // the late arrival
    val b3 = Seq((1L, t(4), 4L, "A"), // re-delivery: must drop
      (3L, t(9), 9L, "Z"))            // new entity
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val seen = scala.collection.mutable.Map[Long, Seq[(Long, Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]]()
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "version").collect().map(r => (
        r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3),
        Option(r.getTimestamp(4)), r.getBoolean(5))).toSeq
    val q = graft.streaming.StreamOps.scd2Sink(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"), ckpt,
      onBatch = (dim, id) => seen.synchronized { seen += id -> rowsOf(dim) })
    try {
      val batches = Seq(b1, b2, b3)
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val got = seen.synchronized(seen.toList).sortBy(_._1)
      assert(got.map(_._1) == List(0L, 1L, 2L))
      // every snapshot equals the batch rebuild over events seen so far
      val prefixes = batches.inits.toSeq.reverse.drop(1)
        .map(_.flatten.distinctBy(_._3))
      for (((_, streamed), prefix) <- got.zip(prefixes)) {
        val expected = rowsOf(Merge.scd2Dim(
          prefix.toDF("user_id", "ts", "event_id", "event_type")))
        assert(streamed === expected)
      }
      // the split, explicitly: user 1 goes 3 versions -> 4, and the late
      // A occupies [t4, t5) between the truncated B run and C
      val u1Before = got(0)._2.filter(_._1 == 1L)
      val u1After = got(1)._2.filter(_._1 == 1L)
      assert(u1Before.map(x => (x._2, x._3)) === Seq((1L, "A"), (2L, "B"), (3L, "C")))
      assert(u1After.map(x => (x._2, x._3)) ===
        Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "C")))
      assert(u1After(1)._5 === Some(t(4)), "B's range was not truncated at the late ts")
      assert(u1After(2)._4 === t(4) && u1After(2)._5 === Some(t(5)))
      // user 2's rows passed through the anti-join unchanged
      assert(got(1)._2.filter(_._1 == 2L) === got(0)._2.filter(_._1 == 2L))
    } finally q.stop()
  }

  test("profile (approx mode) audits every column in one scan, exact null counts") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a"))
    ).toDF("id", "s")
    val p = graft.operators.Profile.profile(df) // approx distinct — the scale default
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(p.keySet === Set("id", "s"))
    assert(p("id") === ((4L, 0L, 4L, "1"))) // HLL exact at this cardinality
    assert(p("s")._2 === 1L) // one null, counted exactly
    assert(p("s")._4 === "a")
    // the plan must NOT expand rows (no multi-distinct Expand) in approx mode
    val plan = graft.operators.Profile.profile(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
  }

  test("applyCdcBatch replay guard: a fully-applied batch re-run is a no-op") {
    import graft.streaming.StreamOps
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-replay").toString + "/snap"
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("status", StringType), StructField("price", DoubleType)))
    def apply(batchId: Long, rows: Seq[(Long, String, Double, Long, String)]): Unit =
      StreamOps.applyCdcBatch(rows.toDF("k", "status", "price", "v", "op"),
        batchId, dir, schema, Seq("k"), "v", "op", "D")
    apply(0L, Seq((1L, "a", 10.0, 1L, "U")))
    apply(1L, Seq((2L, "b", 20.0, 1L, "U")))
    def snap() = StreamOps.readSnapshot(spark, dir, schema)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(snap() === Seq((1L, "a"), (2L, "b")))
    // crash-window replay of batch 1 (LATEST already = snap_1): without
    // the guard this would merge snap_1 onto itself while overwriting
    // the directory being read; the guard must skip it entirely — even
    // a nondeterministically-different replay payload must not apply
    apply(1L, Seq((9L, "GHOST", 0.0, 1L, "U")))
    assert(snap() === Seq((1L, "a"), (2L, "b")), "replayed batch must be skipped")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "LATEST")).trim === "snap_1")
  }

  test("packBySize: every doc lands in the pack its first token starts in") {
    val docs = Seq(
      (1L, 300L), (2L, 300L), (3L, 300L), (4L, 50L), (5L, 600L)
    ).toDF("doc_id", "n")
    val packed = Packing.packBySize(docs, col("n"),
        Seq(lit(0)), Seq(col("doc_id")), budget = 500L)
      .select("doc_id", "start_tok", "pack_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // starts: 0, 300, 600, 900, 950 → packs 0, 0, 1, 1, 1 of budget 500
    assert(packed.toSeq === Seq(
      (1L, 0L, 0L), (2L, 300L, 0L), (3L, 600L, 1L), (4L, 900L, 1L), (5L, 950L, 1L)))
  }
}
