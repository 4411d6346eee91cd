package graft

import org.scalatest.funsuite.AnyFunSuite

/** Red/green proof that tools/bench_diff.py's executor-metric canary
  * actually FIRES (round-13, verdict item): the shuffle-blowup and
  * new-spill rules had never gated anything — an archived ledger with a
  * silently broken diff is indistinguishable from a healthy one. Each
  * case injects a synthetic detail pair and asserts the exit code + the
  * flagged line, so a future edit to the thresholds or the JSON shape
  * breaks HERE, not silently in a round close.
  *
  * No Spark session — pure subprocess tests against the same python3
  * the round-close recipe uses for tools/check.py.
  */
class BenchDiffSpec extends AnyFunSuite {
  private val tool = new java.io.File("tools/bench_diff.py").getAbsolutePath

  private def detail(path: java.nio.file.Path, sec: Double,
                     shuffle: Long, spill: Long): String = {
    val f = path.toString
    java.nio.file.Files.writeString(path,
      s"""{"metric":"detail","unit":"sec","sf":"/root/testdata/sf0.1",""" +
        s""""failed":[],"queries":{"q_x":$sec,"q_ok":1.0},""" +
        s""""metrics":{"q_x":{"shuffle_read":$shuffle,"shuffle_write":0,""" +
        s""""spill_mem":0,"spill_disk":$spill,"input":100,"peak_mem":1,"tasks":4},""" +
        s""""q_ok":{"shuffle_read":1000,"shuffle_write":1000,"spill_mem":0,""" +
        s""""spill_disk":0,"input":100,"peak_mem":1,"tasks":4}}}""")
    f
  }

  /** (exit code, combined stdout+stderr). */
  private def run(prev: String, cur: String): (Int, String) = {
    val pb = new ProcessBuilder("python3", tool, prev, cur)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    (p.waitFor(), out)
  }

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("benchdiff").resolve(name)

  test("shuffle blowup >=1.5x and >=8MiB trips METRIC-REGRESSED, exit 1") {
    // 10 MiB -> 40 MiB: both the ratio (4x >= 1.5x) and the absolute
    // floor (30 MiB >= 8 MiB) trip; wall-time flat so ONLY the metric
    // rule can be what fires.
    val prev = detail(tmp("prev.json"), 2.0, 10L << 20, 0)
    val cur = detail(tmp("cur.json"), 2.0, 40L << 20, 0)
    val (code, out) = run(prev, cur)
    assert(out.contains("METRIC-REGRESSED  q_x"), out)
    assert(out.contains("shuffle 10MiB -> 40MiB"), out)
    assert(code == 1, s"metric regression must gate (exit 1): $out")
  }

  test("sub-floor shuffle growth does NOT trip (8 MiB absolute floor)") {
    // 1 MiB -> 4 MiB is 4x but only +3 MiB — ratio alone must not flag
    // (small-query jitter), mirroring the wall-time envelope philosophy.
    val prev = detail(tmp("prev.json"), 2.0, 1L << 20, 0)
    val cur = detail(tmp("cur.json"), 2.0, 4L << 20, 0)
    val (code, out) = run(prev, cur)
    assert(!out.contains("METRIC-REGRESSED"), out)
    assert(code == 0, s"sub-floor growth must not gate: $out")
  }

  test("new spill >=1MiB where prev <1MiB trips, exit 1") {
    val prev = detail(tmp("prev.json"), 2.0, 1000, 0)
    val cur = detail(tmp("cur.json"), 2.0, 1000, 2L << 20)
    val (code, out) = run(prev, cur)
    assert(out.contains("NEW SPILL"), out)
    assert(code == 1, s"new spill must gate (exit 1): $out")
  }

  test("prevDetail parses baseline_sf and defaults it to sf for old archives") {
    // The ADVICE-r13 canary guard reads the ARCHIVED run's baseline
    // lane: a capstone archive (baseline_sf != sf) must be
    // distinguishable from a uniform-lane archive, and pre-r13 files
    // without the field must default to sf (uniform lane) rather than
    // disable the canary.
    def write(name: String, body: String): String = {
      val f = java.io.File.createTempFile(name, ".json")
      f.deleteOnExit()
      java.nio.file.Files.writeString(f.toPath, body)
      f.getAbsolutePath
    }
    val capstone = write("detail_capstone",
      """{"metric":"detail","unit":"sec","sf":"/tmp/scale100",""" +
        """"baseline_sf":"/tmp/scale10","queries":{"q_a":1.5,"join_theta":64.7}}""")
    val Some((_, sf1, b1, lane1, q1)) = Bench.prevDetail(Some(capstone))
    assert(sf1 == "/tmp/scale100" && b1 == "/tmp/scale10")
    assert(q1 == Map("q_a" -> 1.5, "join_theta" -> 64.7))
    assert(lane1.isEmpty, "pre-r15 archive has no lane — must parse as None")
    val preR13 = write("detail_old",
      """{"metric":"detail","unit":"sec","sf":"/root/testdata/sf0.1",""" +
        """"queries":{"q_a":0.7}}""")
    val Some((_, sf2, b2, _, _)) = Bench.prevDetail(Some(preR13))
    assert(sf2 == "/root/testdata/sf0.1" && b2 == sf2,
      "missing baseline_sf must default to sf (uniform lane), not disable the canary")
    // unparseable file → None (the loud-warning path)
    val bad = write("detail_bad", """{"metric":"detail","nope":true}""")
    assert(Bench.prevDetail(Some(bad)).isEmpty)
  }

  test("prevDetail parses the execution lane; laneComparable gates the diff") {
    // Round-15 verdict #3: BENCH_r14's driver run (cpus=32) false-flagged
    // 3 regressions against the builder's local[4] archive — the canary
    // guarded the DATA lane (sf dirs) but not the EXECUTION lane. Inject
    // an archive carrying the lane and assert both the parse and the
    // decision each way.
    def write(name: String, body: String): String = {
      val f = java.io.File.createTempFile(name, ".json")
      f.deleteOnExit()
      java.nio.file.Files.writeString(f.toPath, body)
      f.getAbsolutePath
    }
    val withLane = write("detail_lane",
      """{"metric":"detail","unit":"sec","sf":"/root/testdata/sf0.1",""" +
        """"baseline_sf":"/root/testdata/sf0.1",""" +
        """"lane":{"cpus":"4","runs":2,"heavy_reruns":0},""" +
        """"queries":{"q_a":0.7,"q_b":1.2}}""")
    val Some((_, _, _, lane, q)) = Bench.prevDetail(Some(withLane))
    assert(lane.contains(("4", 2, 0)), s"lane parse: $lane")
    assert(q == Map("q_a" -> 0.7, "q_b" -> 1.2))
    // same lane → comparable; any component differing → not
    assert(Bench.laneComparable(lane, ("4", 2, 0)))
    assert(!Bench.laneComparable(lane, ("32", 2, 0)),
      "the r14 driver case: cpus 32 vs archived 4 must skip the diff")
    assert(!Bench.laneComparable(lane, ("4", 1, 10)),
      "a RUNS=1 capstone lane vs a min-of-2 archive must skip the diff")
    // unknown lane (pre-r15 archive) stays comparable — old behavior
    assert(Bench.laneComparable(None, ("4", 2, 0)))
  }

  test("cumulative canary: oldest comparable archive wins the window; 2x envelope fires") {
    // Round-16 verdict #6: sub-envelope drift compounds invisibly —
    // r15's join_bucketed went 0.69 -> 0.94 (1.36x, waved through by the
    // per-round 1.5x envelope); three such rounds are a silent 2.5x.
    // Inject a three-archive ledger and assert (a) the window anchors at
    // the OLDEST comparable archive, skipping a lane-mismatched older
    // one, and (b) the >=2x AND >=0.5s cumulative envelope fires exactly
    // where per-round diffs stayed clean.
    val dir = java.nio.file.Files.createTempDirectory("cumdiff")
    def write(name: String, sf: String, lane: String, qx: Double): Unit = {
      java.nio.file.Files.writeString(dir.resolve(name),
        s"""{"metric":"detail","unit":"sec","sf":"$sf",""" +
          s""""baseline_sf":"$sf",$lane""" +
          s""""queries":{"q_drift":$qx,"q_ok":1.0}}""")
      ()
    }
    val lane4 = """"lane":{"cpus":"4","runs":2,"heavy_reruns":0},"""
    val lane32 = """"lane":{"cpus":"32","runs":1,"heavy_reruns":10},"""
    write("BENCH_DETAIL_r12.json", "/root/testdata/sf0.1", lane32, 0.50) // lane mismatch — must skip
    write("BENCH_DETAIL_r13.json", "/root/testdata/sf0.1", lane4, 0.69)  // the window anchor
    write("BENCH_DETAIL_r14.json", "/root/testdata/sf0.1", lane4, 0.94)  // newest (per-round diff's target)
    val paths = Bench.archivePaths(dir.toString)
    assert(paths.map(p => new java.io.File(p).getName) ==
      Seq("BENCH_DETAIL_r12.json", "BENCH_DETAIL_r13.json", "BENCH_DETAIL_r14.json"))
    val Some((anchor, oldQ)) =
      Bench.oldestComparable("/root/testdata/sf0.1", ("4", 2, 0), paths)
    assert(anchor.endsWith("BENCH_DETAIL_r13.json"),
      s"window must anchor at the oldest COMPARABLE archive, got $anchor")
    assert(oldQ("q_drift") == 0.69)
    // current run: q_drift 1.42 — 1.51x vs r14 (per-round would just
    // barely flag at 1.5x... use 1.40: 1.49x vs r14, per-round CLEAN) but
    // 2.03x and +0.71s vs the r13 anchor — the cumulative canary's case
    val cur = Map("q_drift" -> 1.40, "q_ok" -> 1.05)
    val perRound = cur.toSeq.flatMap { case (n, c) =>
      // the per-round envelope, as main computes it vs r14
      Map("q_drift" -> 0.94, "q_ok" -> 1.0).get(n) match {
        case Some(p) if c >= 1.5 * p && c - p >= 0.5 => Some(n)
        case _ => None
      }
    }
    assert(perRound.isEmpty, "fixture broke: per-round diff must stay clean")
    val cum = Bench.cumulativeRegressions(cur, oldQ, _ => false)
    assert(cum == Seq(("q_drift", 0.69, 1.40)),
      s"cumulative envelope must fire on the compounded drift: $cum")
    // sub-envelope cumulative growth must NOT fire (1.9x)
    assert(Bench.cumulativeRegressions(Map("q_drift" -> 1.31), oldQ, _ => false).isEmpty)
    // excluded queries (bounded-dial baselines) never flag
    assert(Bench.cumulativeRegressions(cur, oldQ, _ == "q_drift").isEmpty)
    // a capstone archive (baseline_sf != sf) is not window-comparable
    java.nio.file.Files.writeString(dir.resolve("BENCH_DETAIL_r11.json"),
      """{"metric":"detail","unit":"sec","sf":"/root/testdata/sf0.1",""" +
        """"baseline_sf":"/tmp/scale10",""" + lane4 +
        """"queries":{"q_drift":0.10}}""")
    val Some((anchor2, _)) = Bench.oldestComparable(
      "/root/testdata/sf0.1", ("4", 2, 0), Bench.archivePaths(dir.toString))
    assert(anchor2.endsWith("BENCH_DETAIL_r13.json"),
      "a bounded-baseline capstone archive must not anchor the window")
  }

  test("identical metrics and flat times exit 0") {
    val prev = detail(tmp("prev.json"), 2.0, 10L << 20, 0)
    val cur = detail(tmp("cur.json"), 2.1, 10L << 20, 0)
    val (code, out) = run(prev, cur)
    assert(code == 0, out)
    assert(out.contains("no per-query regressions"), out)
  }
}
