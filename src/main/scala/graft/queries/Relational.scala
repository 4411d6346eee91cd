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
            Oracle.revenue(col("l_extendedprice"), col("l_discount")).as("revenue")))
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
    "agg_pricing" -> { (s, dir) => aggPricing(s, dir) }
  )

  /** TPC-H Q1-shaped pricing summary — also the driver's flagship `entry`. */
  def aggPricing(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(Oracle.dec(col("l_quantity"))).as("sum_qty"),
        sum(Oracle.dec(col("l_extendedprice"))).as("sum_base_price"),
        sum(Oracle.revenue(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val oracle: Map[String, String] = Map(
    "scan_project" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity,
         |${Oracle.revenueSql("l_extendedprice", "l_discount")} AS revenue
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
         |SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         |SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
         |SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS sum_disc_price,
         |ROUND(AVG(l_quantity), 4) AS avg_qty,
         |COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
