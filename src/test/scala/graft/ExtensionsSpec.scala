package graft

import graft.functions.Geo
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected SQL functions must agree exactly with the Column-API geo
  * expressions (same built-in math nodes underneath) and stay inside
  * whole-stage codegen.
  */
class ExtensionsSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  // leave a clean slate: the next suite must not silently inherit this
  // session (local[2], extensions) in place of its own configuration
  override def afterAll(): Unit = if (sparkCreated) spark.stop()
  @volatile private var sparkCreated = false

  lazy val spark: SparkSession = {
    // Suites share one forked JVM: getOrCreate would silently return a
    // previous suite's session, DROPPING withExtensions (which only
    // applies at creation) — whether that happens depends on which
    // suite ran before this one (those that stop() their session leave
    // room, those that don't leave their session active). Stop whatever
    // is active so the extensions session is always freshly created.
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sparkCreated = true
    s
  }

  test("haversine_m / initial_bearing SQL functions match the Column API") {
    val rows = spark.sql(
      """SELECT haversine_m(38.8895, -77.0353, 51.5007, -0.1246) AS d,
        |       initial_bearing(38.8895, -77.0353, 51.5007, -0.1246) AS b""".stripMargin)
      .head()
    val viaColumns = spark.range(1).select(
      Geo.haversineMeters(lit(38.8895), lit(-77.0353), lit(51.5007), lit(-0.1246)).as("d"),
      Geo.initialBearing(lit(38.8895), lit(-77.0353), lit(51.5007), lit(-0.1246)).as("b"))
      .head()
    assert(rows.getDouble(0) == viaColumns.getDouble(0))
    assert(rows.getDouble(1) == viaColumns.getDouble(1))
    // sanity: DC → London is ~5.9 Mm at bearing ~51°
    assert(math.abs(rows.getDouble(0) - 5.9e6) < 2e5)
    assert(rows.getDouble(1) > 40 && rows.getDouble(1) < 60)
  }

  test("sketch aggregates are available session-wide via the extensions") {
    import spark.implicits._
    // topk_sketch: exact regime over 3 distinct items
    val topk = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c"))
      .toDF("item").createOrReplaceTempView("ext_items")
    val counts = spark.sql(
      "SELECT explode(topk_sketch(item)) AS (item, ce) FROM ext_items")
      .select(col("item"), element_at(col("ce"), 1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
    // minhash_sig: same values as the operator-registered function
    Seq((1L, 111L), (1L, 222L)).toDF("doc_id", "s").createOrReplaceTempView("ext_sh")
    val sig = spark.sql(
      "SELECT minhash_sig(s) AS sig FROM ext_sh GROUP BY doc_id")
      .head().getSeq[Long](0)
    assert(sig.length === 64 && sig.forall(_ != Long.MaxValue))
  }

  test("cosine_sim native expression matches the fold-based formulation") {
    val df = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 2.0, 3.0) AS ARRAY<DOUBLE>),
        |                  CAST(array(3.0, 2.0, 1.0) AS ARRAY<DOUBLE>)) AS c""".stripMargin)
    val got = df.head().getDouble(0)
    val want = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0)) // = 10/14
    assert(got == want)
    // identical vectors → exactly 1.0; orthogonal → exactly 0.0
    assert(spark.sql("SELECT cosine_sim(CAST(array(1.0,0.0) AS ARRAY<DOUBLE>), CAST(array(1.0,0.0) AS ARRAY<DOUBLE>))")
      .head().getDouble(0) == 1.0)
    assert(spark.sql("SELECT cosine_sim(CAST(array(1.0,0.0) AS ARRAY<DOUBLE>), CAST(array(0.0,1.0) AS ARRAY<DOUBLE>))")
      .head().getDouble(0) == 0.0)
  }

  test("native as-of join (strategy + exec) is row-identical to the window form") {
    val sf = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val df = graft.plans.Asof.join(events, orders,
      leftKey = col("user_id"), rightKey = col("o_custkey"),
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      rightTieBreak = col("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_orderdate"))
    // the custom strategy must have planned the custom operator
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      df.queryExecution.executedPlan.toString)
    val got = df.orderBy(col("event_id")).collect().map(_.toSeq).toSeq
    val want = queries.Joins.queries("join_asof")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got.size == want.size, s"${got.size} vs ${want.size}")
    assert(got == want)
  }

  test("native as-of join skips NULL right times without stalling the cursor") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // nulls sort FIRST under ascending order — the null-time row heads
    // the key group and must be consumed, not treated as a stop signal
    val rights = Seq(
      (1L, Option.empty[java.sql.Timestamp], 90L),
      (1L, Some(t("2024-01-01 00:10:00")), 91L),
      (2L, Some(t("2024-01-01 00:30:00")), 92L))
      .toDF("rkey", "rtime", "rid")
    val lefts = Seq(
      (1L, t("2024-01-01 00:20:00"), 10L),
      (2L, t("2024-01-01 00:20:00"), 11L)) // before its only right row
      .toDF("lkey", "ltime", "lid")
    val out = graft.plans.Asof.join(lefts, rights,
        col("lkey"), col("rkey"), col("ltime"), col("rtime"), col("rid"))
      .select(col("lid"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((10L, 91L))) // lid=11 unmatched; null time ignored
  }

  test("injected functions run over table columns inside codegen") {
    val df = spark.range(100).selectExpr(
      "id",
      "haversine_m(CAST(id % 80 AS DOUBLE), CAST(id % 170 AS DOUBLE), 0.0, 0.0) AS d",
      "initial_bearing(CAST(id % 80 AS DOUBLE), CAST(id % 170 AS DOUBLE), 0.0, 0.0) AS b")
    // Whole-stage codegen renders as a `*(stage)` prefix in the simple
    // plan string.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
    val rows = df.collect()
    assert(rows.forall(r => r.getDouble(1) >= 0))
    assert(rows.forall(r => r.getDouble(2) >= 0 && r.getDouble(2) < 360))
  }
}
