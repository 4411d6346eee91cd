package graft.queries

import graft.Tables
import graft.functions.{Geo, GeoMeanAggregator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-defined-extension surface (SURVEY.md §2.3 `udf_scalar`,
  * `udaf_typed`, `udtf_generate`, `approx_distinct`).
  *
  * UDFs are deliberately the EXCEPTION in this engine (they fall out of
  * whole-stage codegen): `udf_scalar` exists to prove the surface and
  * self-checks against the native-expression formulation inside the same
  * query; `udaf_typed` is the one genuine `Aggregator`; generators use
  * the built-in `explode(sequence(...))`.
  */
object Udx {
  type Q = (SparkSession, String) => DataFrame

  /** Plain-Scala haversine — the UDF body (same formula as [[Geo]]). */
  private def haversineScala(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371000.0
    val (la1, la2) = (math.toRadians(lat1), math.toRadians(lat2))
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(la1) * math.cos(la2) * math.pow(math.sin(dLon / 2), 2)
    r * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
  }

  val queries: Map[String, Q] = Map(
    // -- scalar UDF, self-checked against the native expression -----------
    "udf_scalar" -> { (s, dir) =>
      val hav = udf(haversineScala _)
      s.udf.register("haversine_udf", hav)
      val lat1 = (col("c_custkey") % 17).cast("double") * 10 - 80
      val lon1 = (col("c_custkey") % 35).cast("double") * 10 - 170
      val lat2 = ((col("c_custkey") + 7) % 17).cast("double") * 10 - 80
      val lon2 = ((col("c_custkey") + 13) % 35).cast("double") * 10 - 170
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
          round(hav(lat1, lon1, lat2, lon2), 4).as("dist_udf"),
          (round(hav(lat1, lon1, lat2, lon2), 4) ===
            round(Geo.haversineMeters(lat1, lon1, lat2, lon2), 4))
            .as("matches_native"))
        .orderBy(col("c_custkey"))
    },

    // -- typed Aggregator UDAF ---------------------------------------------
    "udaf_typed" -> { (s, dir) =>
      val geoMean = udaf(new GeoMeanAggregator())
      s.udf.register("geo_mean", geoMean)
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(geoMean(col("l_quantity")), 6).as("geo_mean_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // -- generator / UDTF surface -------------------------------------------
    "udtf_generate" -> { (s, dir) =>
      Tables(s, dir, "part")
        .filter(col("p_partkey") < 20)
        .select(col("p_partkey"), explode(sequence(lit(1), col("p_size"))).as("g"))
        .groupBy(col("p_partkey"))
        .agg(sum(col("g")).cast("long").as("sum_g"), count(lit(1)).as("n_g"))
        .orderBy(col("p_partkey"))
    },

    // -- sketch aggregate (HLL++) — approximate, so rows-only + property
    //    test (|approx − exact| ≤ 5%); implementations differ across
    //    engines by design. rsd=0.02: the default 0.05 is a *standard
    //    deviation*, which legitimately exceeded the 5% test bound on the
    //    1500-key fixture (observed 6.7% ≈ 1.3σ).
    "approx_distinct" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .agg(
          approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_custs"),
          countDistinct(col("o_custkey")).as("exact_custs"))
        .select(col("approx_custs"), col("exact_custs"),
          (abs(col("approx_custs") - col("exact_custs")) <=
            col("exact_custs") * 0.05).as("within_5pct"))
    },

    // -- quantile sketch (GK / approx_percentile) — like approx_distinct:
    //    approximate by design, so rows-only with a self-check. The check
    //    asserts the sketch's own guarantee (accuracy 1000 ⇒ the returned
    //    value's rank is within n/1000 of 0.5·n) via a broadcast
    //    rank-count — NOT an exact `percentile()` arm, which buffers every
    //    value per group (ObjectHashAggregate sort-fallback hazard at
    //    scale, and it was 7% of the whole sf0.1 bench).
    "approx_percentile" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(
          approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_approx"),
          count(lit(1)).as("n"))
      // rank the approx value inside its group with one broadcast join +
      // codegen'd hash agg: O(1) memory per group, no value buffering.
      // Duplicates give the value a rank INTERVAL [rank_lt+1, rank_le];
      // the guarantee holds if it intersects 0.5·n ± (n/1000 + 1).
      li.join(broadcast(approx), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("p50_approx"), col("n"))
        .agg(
          sum(when(col("l_extendedprice") < col("p50_approx"), 1L).otherwise(0L)).as("rank_lt"),
          sum(when(col("l_extendedprice") <= col("p50_approx"), 1L).otherwise(0L)).as("rank_le"))
        .select(col("l_returnflag"), col("p50_approx"), col("n"), col("rank_le"),
          (col("rank_lt") + 1 <= col("n") / 2 + col("n") / 1000 + 1 &&
            col("rank_le") >= col("n") / 2 - col("n") / 1000 - 1)
            .as("within_rank_bound"))
        .orderBy(col("l_returnflag"))
    }
  )

  val oracle: Map[String, String] = Map(
    // The oracle for the UDF is the same native formula — proving the UDF
    // path produces identical numbers to expression codegen.
    "udf_scalar" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |    CAST(c_custkey % 17 AS DOUBLE) * 10 - 80 AS lat1,
        |    CAST(c_custkey % 35 AS DOUBLE) * 10 - 170 AS lon1,
        |    CAST((c_custkey + 7) % 17 AS DOUBLE) * 10 - 80 AS lat2,
        |    CAST((c_custkey + 13) % 35 AS DOUBLE) * 10 - 170 AS lon2
        |  FROM customer)
        |SELECT c_custkey,
        |ROUND(2 * 6371000 * atan2(
        |    sqrt(sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
        |      + cos(radians(lat1)) * cos(radians(lat2))
        |        * sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2)),
        |    sqrt(1 - (sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
        |      + cos(radians(lat1)) * cos(radians(lat2))
        |        * sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2)))
        |  ), 4) AS dist_udf,
        |TRUE AS matches_native
        |FROM pts ORDER BY c_custkey""".stripMargin,

    "udaf_typed" ->
      """SELECT l_returnflag,
        |ROUND(EXP(AVG(LN(l_quantity))), 6) AS geo_mean_qty,
        |COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "udtf_generate" ->
      """SELECT p_partkey, CAST(SUM(g) AS BIGINT) AS sum_g, COUNT(*) AS n_g
        |FROM (SELECT p_partkey, unnest(generate_series(1, p_size)) AS g
        |      FROM part WHERE p_partkey < 20)
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin
  )
}
