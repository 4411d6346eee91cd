package graft.queries

import graft.{Oracle, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scans, filters, aggregations, joins, sorts, set ops
  * (SURVEY.md §2.3 rows `scan_project` … `set_except`).
  *
  * Every query here is declarative DataFrame API so Catalyst handles
  * predicate pushdown, column pruning, partial aggregation and join
  * selection; at 100 TB the same plans hold (hash-agg with map-side
  * combine, broadcast for dims, sort-merge for fact-fact joins with AQE
  * skew handling). Determinism discipline per [[graft.Oracle]].
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- scan + projection -------------------------------------------------
    // Pushes a 5-column ReadSchema into the parquet scan; revenue is exact
    // decimal math; total order (l_orderkey, l_linenumber) before LIMIT.
    "scan_project" -> { (s, dir) =>
      Oracle.totalOrder(
        Tables(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            Oracle.out(Oracle.revenue(col("l_extendedprice"), col("l_discount"))).as("revenue")))
        .limit(100)
    },

    // -- filter ------------------------------------------------------------
    // Compound predicate (AND/OR, IN, BETWEEN, LIKE, timestamp compare);
    // all conjuncts are parquet-pushable (PushedFilters in .explain).
    "filter_pred" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(
          col("l_quantity").between(5, 15) &&
          col("l_returnflag").isin("A", "R") &&
          (col("l_linestatus").like("F%") || col("l_discount") < 0.03) &&
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate"))
        .transform(Oracle.totalOrder)
    },

    // -- hash aggregation (flagship; TPC-H Q1 shape) -----------------------
    // groupBy → partial (map-side) + final HashAggregate; decimal sums are
    // order-independent; avg over integer-valued doubles is exact.
    "agg_pricing" -> { (s, dir) => aggPricing(s, dir) },

    // -- distinct aggregation ---------------------------------------------
    // count(DISTINCT) expands to a two-stage aggregate (distinct keys
    // shuffled once); plain count rides along as a partial aggregate.
    "agg_distinct" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // -- statistical aggregation ------------------------------------------
    // Float stddev/avg are order-sensitive in the low bits → round(…,4)
    // on both engine sides (SURVEY.md §7.4 hazard 2).
    "agg_stats" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          round(stddev_samp(col("value")), 4).as("sd_v"),
          round(avg(col("value")), 4).as("avg_v"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // -- rollup / cube / grouping sets ------------------------------------
    // Spark expands these into a single Expand + HashAggregate (one pass,
    // one shuffle). grouping_id() bit-encoding verified identical to
    // DuckDB's GROUPING(a,b). NULL group keys sort NULLS FIRST on both
    // sides (Spark asc default; explicit in the DuckDB SQL).
    "agg_rollup" -> { (s, dir) =>
      ordersCustomer(s, dir)
        .rollup(col("c_mktsegment"), col("o_orderstatus"))
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          Oracle.out(sum(Oracle.dec(col("o_totalprice")))).as("total"))
        .orderBy(col("gid"), col("c_mktsegment"), col("o_orderstatus"))
    },

    "agg_cube" -> { (s, dir) =>
      ordersCustomer(s, dir)
        .cube(col("c_mktsegment"), col("o_orderstatus"))
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          Oracle.out(sum(Oracle.dec(col("o_totalprice")))).as("total"))
        .orderBy(col("gid"), col("c_mktsegment"), col("o_orderstatus"))
    },

    "agg_grouping_sets" -> { (s, dir) =>
      ordersCustomer(s, dir)
        .groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("o_orderstatus")), Seq()),
          col("c_mktsegment"), col("o_orderstatus"))
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          Oracle.out(sum(Oracle.dec(col("o_totalprice")))).as("total"))
        .orderBy(col("gid"), col("c_mktsegment"), col("o_orderstatus"))
    }
  )

  /** orders ⋈ customer on custkey — the shared input of the rollup/cube/
    * grouping-sets trio. customer is ~1% of orders; Catalyst broadcasts it
    * at any scale factor (dim-table pattern that holds at 100 TB).
    */
  private def ordersCustomer(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "inner")

  /** TPC-H Q1-shaped pricing summary — also the driver's flagship `entry`. */
  def aggPricing(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Oracle.out(sum(Oracle.dec(col("l_quantity")))).as("sum_qty"),
        Oracle.out(sum(Oracle.dec(col("l_extendedprice")))).as("sum_base_price"),
        Oracle.out(sum(Oracle.revenue(col("l_extendedprice"), col("l_discount")))).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val oracle: Map[String, String] = Map(
    "scan_project" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity,
         |${Oracle.outSql(Oracle.revenueSql("l_extendedprice", "l_discount"))} AS revenue
         |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, revenue
         |LIMIT 100""".stripMargin,

    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 15
        |  AND l_returnflag IN ('A', 'R')
        |  AND (l_linestatus LIKE 'F%' OR l_discount < 0.03)
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_returnflag, l_linestatus, l_shipdate""".stripMargin,

    "agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
         |ROUND(AVG(l_quantity), 4) AS avg_qty,
         |COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct" ->
      """SELECT o_orderpriority,
        |COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_stats" ->
      """SELECT event_type, MIN(value) AS min_v, MAX(value) AS max_v,
        |ROUND(STDDEV_SAMP(value), 4) AS sd_v, ROUND(AVG(value), 4) AS avg_v,
        |COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_rollup" ->
      """SELECT c_mktsegment, o_orderstatus,
        |CAST(GROUPING(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
        |COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)
        |ORDER BY gid, c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT c_mktsegment, o_orderstatus,
        |CAST(GROUPING(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
        |COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus)
        |ORDER BY gid, c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT c_mktsegment, o_orderstatus,
        |CAST(GROUPING(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
        |COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
        |ORDER BY gid, c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin
  )
}
