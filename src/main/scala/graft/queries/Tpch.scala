package graft.queries

import graft.{Oracle, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-shaped analytical pipelines adapted to the fixture schema —
  * recognisable multi-join + aggregate + top-k workloads that exercise
  * the whole optimizer path at once (join ordering, broadcast selection,
  * partial aggregation, ordered limits). `tpch_q1` is the full
  * 8-column published shape; `agg_pricing` remains the abridged
  * flagship form the driver smoke-checks.
  */
object Tpch {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Q1, the full 8-column pricing summary (agg_pricing is the
    // abridged flagship form; this is the complete published shape,
    // charge included). All money aggregates run in exact decimal
    // (Oracle.revenue discipline — charge keeps scale 6, lossless),
    // float avgs rounded to 4. One partial-aggregating scan, ~6 groups.
    "tpch_q1" -> { (s, dir) =>
      val charge = (Oracle.revenue(col("l_extendedprice"), col("l_discount")) *
        Oracle.dec(lit(1) + col("l_tax"))).cast(org.apache.spark.sql.types.DecimalType(18, 6))
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Oracle.out(sum(Oracle.dec(col("l_quantity")))).as("sum_qty"),
          Oracle.out(sum(Oracle.dec(col("l_extendedprice")))).as("sum_base_price"),
          Oracle.out(sum(Oracle.revenue(col("l_extendedprice"), col("l_discount")))).as("sum_disc_price"),
          Oracle.out(sum(charge)).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Q3 shape: shipping-priority revenue for one segment, top 10.
    "tpch_q3" -> { (s, dir) =>
      val cutoff = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
      Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > cutoff)
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(Oracle.out(sum(Oracle.revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // Q5 shape: revenue per nation where the supplying and buying
    // nations match, one region, one year — the 6-table join.
    "tpch_q5" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(Oracle.out(sum(Oracle.revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },

    // Q10 shape: revenue lost to returned items per customer, top 20.
    "tpch_q10" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-07-01 00:00:00")))
        .join(Tables(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey") && col("l_returnflag") === "R")
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(Oracle.out(sum(Oracle.revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // Q6 shape: forecasted revenue change — a pure scan+filter+agg with
    // every predicate parquet-pushable; the whole query is one partial+
    // final aggregate, zero joins.
    "tpch_q6" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.02, 0.04) &&
          col("l_quantity") < 24)
        .agg(
          Oracle.out(sum(Oracle.dec(col("l_extendedprice")) * Oracle.dec(col("l_discount"))))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Q12 shape: per linestatus, how many lines belong to high- vs
    // low-priority orders in one ship-year (CASE-sum inside one agg pass;
    // the orderkey join is the only shuffle).
    "tpch_q12" -> { (s, dir) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(hi, 1L).otherwise(0L)).cast("long").as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).cast("long").as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // Q14 shape: promo-type revenue share per ship-year. Revenue stays
    // exact decimal through both sums; the percentage divides as double.
    "tpch_q14" -> { (s, dir) =>
      val rev = Oracle.revenue(col("l_extendedprice"), col("l_discount"))
      val zero = lit(0).cast(Oracle.Money4)
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).cast("int").as("ship_year"))
        .agg(
          round(lit(100) * Oracle.out(sum(when(col("p_type") === "PROMO", rev).otherwise(zero))) /
            Oracle.out(sum(rev)), 6).as("promo_pct"),
          Oracle.out(sum(rev)).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("ship_year"))
    },

    // Q18 shape: large-quantity orders (HAVING-subquery flavour). The
    // per-order quantity aggregate is computed ONCE and reused as both
    // the filter and the output column — no second lineitem pass, no IN
    // subquery re-scan.
    "tpch_q18" -> { (s, dir) =>
      val perOrder = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      perOrder
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), Oracle.out(Oracle.dec(col("o_totalprice"))).as("totalprice"),
          col("sum_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    },

    // RANGE frame (value-based, vs win_frame's ROWS): running order count
    // and decimal sum over a 1000-wide totalprice band per segment.
    // Computed with the band-parallel rewrite (BandedWindow): a direct
    // `rangeBetween(-1000, 0)` over partitionBy(c_mktsegment) is a
    // 5-task parallelism ceiling — each segment one serial O(n) walk at
    // any cluster size. Row-identity with the direct formulation is
    // pinned in PropertySpec.
    "win_range_frame" -> { (s, dir) =>
      val joined = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"),
          col("o_totalprice").as("totalprice_d"))
      graft.operators.BandedWindow.rangeCountSum(joined, Seq("c_mktsegment"),
          "totalprice_d", width = 1000L, cntName = "n_band", sumName = "band_sum")
        .select(col("o_orderkey"), col("c_mktsegment"),
          Oracle.out(Oracle.dec(col("totalprice_d"))).as("totalprice"),
          col("n_band"), Oracle.out(col("band_sum")).as("band_sum"))
        .transform(Oracle.totalOrder)
    }
  )

  val oracle: Map[String, String] = Map(
    "tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
         |CAST(SUM(CAST(${Oracle.revenueSql("l_extendedprice", "l_discount")} * CAST(1 + l_tax AS DECIMAL(18,2)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
         |ROUND(AVG(l_quantity), 4) AS avg_qty,
         |ROUND(AVG(l_extendedprice), 4) AS avg_price,
         |ROUND(AVG(l_discount), 4) AS avg_disc,
         |COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "tpch_q3" ->
      s"""SELECT o_orderkey, o_orderdate,
         |CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "tpch_q5" ->
      s"""SELECT n_name,
         |CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
         |COUNT(*) AS n_lines
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,

    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_mktsegment,
         |CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
         |COUNT(*) AS n_items
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_mktsegment
         |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "tpch_q6" ->
      """SELECT
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_quantity < 24""".stripMargin,

    "tpch_q12" ->
      """SELECT l_linestatus,
        |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "tpch_q14" ->
      s"""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
         |ROUND(100 * CAST(SUM(CASE WHEN p_type = 'PROMO'
         |    THEN ${Oracle.revenueSql("l_extendedprice", "l_discount")}
         |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         |  / CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE), 6) AS promo_pct,
         |CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
         |COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY ship_year ORDER BY ship_year""".stripMargin,

    "tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice, sum_qty
        |FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "win_range_frame" ->
      """SELECT o_orderkey, c_mktsegment,
        |CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
        |COUNT(*) OVER w AS n_band,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS band_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice
        |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey, c_mktsegment, totalprice, n_band, band_sum""".stripMargin
  )
}
