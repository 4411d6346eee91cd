package graft

import graft.functions.Geo
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.5): geo invariants, Jaccard bounds,
  * sketch error bound — checked through the same column expressions the
  * engine ships. Inputs are drawn from a fixed-seed generator (the
  * offline dependency set has no scalatest↔scalacheck bridge, so sampling
  * is done directly — same coverage, deterministic).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Evaluate the two geo expressions on a literal coordinate pair. */
  private def geo(lat1: Double, lon1: Double, lat2: Double, lon2: Double): (Double, Double) = {
    val row = spark.range(1).select(
      Geo.initialBearing(lit(lat1), lit(lon1), lit(lat2), lit(lon2)).as("b"),
      Geo.haversineMeters(lit(lat1), lit(lon1), lit(lat2), lit(lon2)).as("d"))
      .head()
    (row.getDouble(0), row.getDouble(1))
  }

  test("bearing ∈ [0,360); distance ≥ 0, symmetric, zero at identity") {
    val rnd = new scala.util.Random(42)
    (1 to 30).foreach { _ =>
      val lat1 = rnd.nextDouble() * 179.8 - 89.9
      val lat2 = rnd.nextDouble() * 179.8 - 89.9
      val lon1 = rnd.nextDouble() * 360 - 180
      val lon2 = rnd.nextDouble() * 360 - 180
      val (b, d) = geo(lat1, lon1, lat2, lon2)
      val (_, dRev) = geo(lat2, lon2, lat1, lon1)
      assert(b >= 0 && b < 360, s"bearing $b for ($lat1,$lon1)->($lat2,$lon2)")
      assert(d >= 0)
      assert(math.abs(d - dRev) <= 1e-6 * math.max(1, d)) // symmetry
    }
    val (_, dSelf) = geo(12.34, 56.78, 12.34, 56.78)
    assert(dSelf == 0.0)
  }

  test("antipodal distance ≈ πR; equator quarter-turn bearing = 90°") {
    val (_, dAnti) = geo(0, 0, 0, 180)
    assert(math.abs(dAnti - math.Pi * Geo.EarthRadiusM) < 1.0)
    val (b, _) = geo(0, 0, 0, 90)
    assert(math.abs(b - 90.0) < 1e-9)
  }

  test("near-dup Jaccard values lie in (0,1] and pairs are ordered") {
    val rows = SparkEntry.queries("dedup_neardup")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j > 0 && j <= 1)
    }
  }

  test("approx_count_distinct stays within its 5% bound on orders") {
    val row = SparkEntry.queries("approx_distinct")(spark, "/root/testdata/sf0.01").head()
    assert(row.getBoolean(2),
      s"approx=${row.getLong(0)} exact=${row.getLong(1)} outside 5%")
  }

  test("native as-of join equals the window formulation on random ties-heavy data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small key/time domains force duplicate keys, duplicate times, and
    // exact left-time==right-time ties — the walk's hard cases
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val rights = (1 to 300).map { i =>
      (rnd.nextInt(8).toLong, ts(rnd.nextInt(40)), i.toLong)
    }.toDF("rkey", "rtime", "rid")
    val lefts = (1 to 200).map { i =>
      (rnd.nextInt(10).toLong, ts(rnd.nextInt(40)), (1000 + i).toLong)
    }.toDF("lkey", "ltime", "lid")
    graft.plans.Asof.register(spark) // plain session — runtime path
    val native = graft.plans.Asof.join(lefts, rights,
        col("lkey"), col("rkey"), col("ltime"), col("rtime"), col("rid"))
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lid"))
      .orderBy(col("rtime").desc, col("rid").desc)
    val windowed = lefts.join(rights,
        col("lkey") === col("rkey") && col("rtime") <= col("ltime"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native === windowed)
  }

  test("binned range join equals the plain interval join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // timestamps straddle bin boundaries incl. exact-boundary values
    val probe = (1 to 150).map(i => (i.toLong, ts(rnd.nextInt(7200).toLong)))
      .toDF("pid", "t0")
    val build = (1 to 300).map(i => (i.toLong, ts(rnd.nextInt(7200).toLong)))
      .toDF("bid", "t1")
    val binned = graft.operators.RangeJoin.window(
        probe, col("t0"), build, col("t1"), windowSeconds = 600L, binSeconds = 450L)
      .select(col("pid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = probe.join(build,
        col("t1") >= col("t0") &&
        col("t1") < col("t0") + expr("INTERVAL 600 SECONDS"))
      .select(col("pid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === plain)
  }

  test("overlap join keeps pairs with sub-second endpoints (micros bin math)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // MILLIsecond-resolution endpoints: whole-second bin math truncates
    // these and drops the final bin an interval touches
    def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val a = (1 to 120).map { i =>
      val s = rnd.nextInt(600000).toLong
      (i.toLong, ts(s), ts(s + 1 + rnd.nextInt(90000)))
    }.toDF("aid", "a_s", "a_e")
    val b = (1 to 180).map { i =>
      val s = rnd.nextInt(600000).toLong
      (i.toLong, ts(s), ts(s + 1 + rnd.nextInt(90000)))
    }.toDF("bid", "b_s", "b_e")
    val binned = graft.operators.RangeJoin.overlap(
        a, "aid", col("a_s"), col("a_e"), b, "bid", col("b_s"), col("b_e"),
        binSeconds = 30L)
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = a.join(b, col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === plain)
    // the hard case concretely: [t, t+0.9s] must claim the bin its
    // fractional tail reaches into
    val a1 = Seq((1L, ts(29500), ts(30900))).toDF("aid", "a_s", "a_e")
    val b1 = Seq((1L, ts(30100), ts(30200))).toDF("bid", "b_s", "b_e")
    assert(graft.operators.RangeJoin.overlap(
      a1, "aid", col("a_s"), col("a_e"), b1, "bid", col("b_s"), col("b_e"),
      binSeconds = 30L).count() == 1L)
  }

  test("overlap join clamps inverted intervals instead of descending sequence()") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // a1 is inverted (e < s) with a HUGE descending span — unclamped it
    // would replicate into ~100k bins; a2 is empty (e == s)
    val a = Seq((1L, ts(100000), ts(0)), (2L, ts(500), ts(500)),
                (3L, ts(400), ts(700))).toDF("aid", "a_s", "a_e")
    val b = Seq((10L, ts(0), ts(200000)), (11L, ts(600), ts(650)))
      .toDF("bid", "b_s", "b_e")
    val got = graft.operators.RangeJoin.overlap(
        a, "aid", col("a_s"), col("a_e"), b, "bid", col("b_s"), col("b_e"),
        binSeconds = 60L)
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = a.join(b, col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select(col("aid"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === plain)
  }

  test("banded RANGE frame equals the direct rangeBetween on boundary-heavy data") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // 2-dp money values with FORCED exact-width boundary pairs (u ==
    // v-1000), duplicates, and band-edge values — the rewrite's hard
    // cases. Values are doubles, as in the real orders table.
    val vals = Seq.fill(400)(math.rint(rnd.nextDouble() * 500000) / 100.0) ++
      Seq(2000.00, 1000.00, 3000.00,         // exact boundary chain
          2999.99, 1999.99,                  // boundary pair off-grid
          5000.00, 5000.00, 4000.00,         // dup + boundary
          123456.78, 122456.78)              // exact-1000 apart
    // NULL ordering values: their own RANGE peer group in the direct
    // form — the rewrite must keep them (3 in seg A+B via i%3 split)
    val withNulls: Seq[Option[Double]] =
      vals.map(Some(_)) ++ Seq(None, None, None)
    val df = withNulls.zipWithIndex.map { case (v, i) =>
      (i.toLong, if (i % 3 == 0) "A" else "B", v)
    }.toDF("id", "seg", "price")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("seg")).orderBy(col("price")).rangeBetween(-1000L, 0L)
    val direct = df
      .withColumn("n_band", count(lit(1)).over(w))
      .withColumn("band_sum", sum(col("price").cast("decimal(18,2)")).over(w))
      .select(col("id"), col("n_band"), Oracle.out(col("band_sum")).as("band_sum"))
      .collect().map(_.toSeq).toSet
    val banded = graft.operators.BandedWindow.rangeCountSum(
        df, Seq("seg"), "price", 1000L, "n_band", "band_sum")
      .select(col("id"), col("n_band"), Oracle.out(col("band_sum")).as("band_sum"))
      .collect().map(_.toSeq).toSet
    assert(banded === direct)

    // min/max — the NON-invertible aggregates (no subtraction identity;
    // the rewrite's descending suffix pass) — on the same hard cases,
    // plus all four at once through the generalized entry point.
    val directMM = df
      .withColumn("band_min", min(col("price").cast("decimal(18,2)")).over(w))
      .withColumn("band_max", max(col("price").cast("decimal(18,2)")).over(w))
      .select(col("id"), Oracle.out(col("band_min")).as("band_min"),
        Oracle.out(col("band_max")).as("band_max"))
      .collect().map(_.toSeq).toSet
    val bandedMM = graft.operators.BandedWindow.rangeFrame(
        df, Seq("seg"), "price", 1000L,
        cntName = Some("n_band"), sumName = Some("band_sum"),
        minName = Some("band_min"), maxName = Some("band_max"))
      .select(col("id"), Oracle.out(col("band_min")).as("band_min"),
        Oracle.out(col("band_max")).as("band_max"))
      .collect().map(_.toSeq).toSet
    assert(bandedMM === directMM)
  }

  test("banded RANGE frame generalizes: avg, first/last-by-order, 3-dp scale") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 3-decimal values (scale=3 band arithmetic), width 7, with forced
    // exact-boundary pairs (u == v-7), duplicates, and band-edge values
    val vals = Seq.fill(300)(math.rint(rnd.nextDouble() * 350000) / 1000.0) ++
      Seq(14.000, 7.000, 21.000,          // exact boundary chain
          13.999, 6.999,                  // boundary pair off-grid
          35.007, 35.007, 28.007,         // dup + exact-7 apart
          123.456, 116.456)               // exact-width pair mid-range
    val withNulls: Seq[Option[Double]] =
      vals.map(Some(_)) ++ Seq(None, None, None)
    val df = withNulls.zipWithIndex.map { case (v, i) =>
      (i.toLong, if (i % 3 == 0) "A" else "B", v)
    }.toDF("id", "seg", "price")
    val dec3 = col("price").cast("decimal(18,3)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("seg")).orderBy(col("price")).rangeBetween(-7L, 0L)
    val outs = Seq("band_cnt", "band_avg", "band_first", "band_last")
    val direct = df
      .withColumn("band_cnt", count(lit(1)).over(w))
      .withColumn("band_avg", avg(dec3).over(w))
      // first/last-by-order = min/max(struct(v, payload)): payload of
      // the frame's extremal value, ties broken by payload
      .withColumn("band_first",
        min(struct(dec3.as("v"), col("id").as("p"))).over(w).getField("p"))
      .withColumn("band_last",
        max(struct(dec3.as("v"), col("id").as("p"))).over(w).getField("p"))
      .select(col("id") +: outs.map(col): _*)
      .collect().map(_.toSeq).toSet
    val banded = graft.operators.BandedWindow.rangeFrame(
        df, Seq("seg"), "price", 7L,
        cntName = Some("band_cnt"), avgName = Some("band_avg"),
        firstName = Some(("band_first", "id")),
        lastName = Some(("band_last", "id")), scale = 3)
      .select(col("id") +: outs.map(col): _*)
      .collect().map(_.toSeq).toSet
    assert(banded === direct)
  }

  test("win_range_frame (banded) equals the direct formulation on the fixture") {
    val sf = "/root/testdata/sf0.01"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment")).orderBy(col("totalprice_d"))
      .rangeBetween(-1000L, 0L)
    val direct = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        col("o_totalprice").as("totalprice_d"))
      .withColumn("n_band", count(lit(1)).over(w))
      .withColumn("band_sum", sum(Oracle.dec(col("totalprice_d"))).over(w))
      .select(col("o_orderkey"), col("c_mktsegment"),
        Oracle.out(Oracle.dec(col("totalprice_d"))).as("totalprice"),
        col("n_band"), Oracle.out(col("band_sum")).as("band_sum"))
      .transform(Oracle.totalOrder)
      .collect().map(_.toSeq).toSeq
    val banded = SparkEntry.queries("win_range_frame")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(banded.size == direct.size)
    assert(banded == direct)
  }

  test("approx_percentile honors the GK rank guarantee per group") {
    val rows = SparkEntry.queries("approx_percentile")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4),
        s"${r.getString(0)}: approx=${r.getDouble(1)} rank_le=${r.getLong(3)} " +
          s"of n=${r.getLong(2)} outside the n/1000 rank bound")
    }
  }

  test("win_ntile banded two-pass equals the direct global window (round-19 verdict #3)") {
    // The distributed rewrite (band partition + broadcast prefix
    // offsets + ntile/percent_rank/cume_dist arithmetic) must be
    // ROW-IDENTICAL to the single-partition window form it replaced —
    // including ties (duplicated (acctbal, custkey) pairs land in one
    // band, so rank/cume tie groups never straddle band boundaries).
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.001"
    val banded = SparkEntry.queries("win_ntile")(spark, sf).collect().toSeq
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val direct = Tables(spark, sf, "customer")
      .select(col("c_custkey"),
        Oracle.out(Oracle.dec(col("c_acctbal"))).as("acctbal"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("c_custkey")).collect().toSeq
    assert(banded === direct,
      "banded global ranks diverged from the window functions")
    // and on an adversarial tie-heavy frame: few distinct acctbals,
    // duplicated custkeys — every rank function exercises tie groups
    import spark.implicits._
    val dup = Seq.tabulate(97)(i =>
      ((i % 5).toLong, BigDecimal(((i % 3) * 500 - 499) + "." + "25")))
      .toDF("c_custkey", "c_acctbal")
      .select(col("c_custkey"), col("c_acctbal").cast("decimal(12,2)").as("c_acctbal"))
    // (cannot reuse the registered query on a literal frame — replicate
    // its banded body via the shared shape check: direct window == the
    // arithmetic over global rank implied by band offsets. Covered by
    // the sf fixture row-identity above; here pin ntile arithmetic on a
    // n % 4 != 0 cardinality through the DIRECT form as ground truth.)
    val wd = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val nt = dup.select(ntile(4).over(wd).as("q")).groupBy("q").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 97 = 4*24 + 1: bucket 1 gets 25, buckets 2-4 get 24
    assert(nt === Map(1 -> 25L, 2 -> 24L, 3 -> 24L, 4 -> 24L))
  }

  test("win_ntile bucket arithmetic matches Spark's NTile in every remainder class") {
    // The fixtures' customer counts are all divisible by 4, so the
    // oracle alone never exercises the remainder>0 branch (or n<4,
    // where bucketSize=0 and the otherwise-branch must stay
    // unevaluated) — pin the exact expressions the registered query
    // uses against Spark's own ntile on synthetic cardinalities.
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("id"))
    Seq(1L, 2L, 3L, 4L, 5L, 7L, 97L, 100L, 101L, 1502L).foreach { n =>
      val df = spark.range(n)
        .withColumn("_grn", row_number().over(w).cast("long"))
        .withColumn("_n", lit(n))
        .withColumn("_bsz", expr("_n div 4"))
        .withColumn("_rem", col("_n") % lit(4L))
        .withColumn("_big", (col("_bsz") + lit(1L)) * col("_rem"))
        .withColumn("mine", when(col("_grn") <= col("_big"),
            expr("(_grn + _bsz) div (_bsz + 1)"))
          .otherwise(col("_rem") + expr("(_grn - _big + _bsz - 1) div _bsz"))
          .cast("int"))
        .withColumn("direct", ntile(4).over(w))
      assert(df.filter(col("mine") =!= col("direct")).count() == 0,
        s"ntile arithmetic diverged at n=$n")
    }
  }
}
