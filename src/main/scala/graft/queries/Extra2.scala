package graft.queries

import graft.{Oracle, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third-wave coverage (round 2): IGNORE NULLS window forms, struct
  * scalars, histogram binning, and ANSI-safe `try_*` scalars. Same
  * determinism discipline as everywhere else ([[graft.Oracle]]).
  */
object Extra2 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- IGNORE NULLS window functions --------------------------------------
    // 'error' events carry no value here; each row sees the most recent
    // non-error value so far — the standard gap-fill (last-observation-
    // carried-forward) window form.
    "win_ignore_nulls" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("v",
          when(col("event_type") === "error", lit(null)).otherwise(col("value")))
        .select(col("event_id"), col("user_id"), col("ts"), col("v"),
          last(col("v"), ignoreNulls = true).over(w).as("last_seen"))
        .orderBy(col("event_id"))
    },

    // -- struct build / access / serialize ----------------------------------
    "fn_struct" -> { (s, dir) =>
      Tables(s, dir, "part")
        .withColumn("sp", struct(col("p_brand").as("brand"),
          col("p_size").cast("int").as("size")))
        .select(
          col("p_partkey"),
          col("sp.brand").as("brand_back"),
          (col("sp.size") + 1).cast("int").as("size_plus"),
          Oracle.json(col("sp")).as("sp_json"))
        .orderBy(col("p_partkey"))
    },

    // -- histogram (explicit floor binning — portable across engines) -------
    "agg_histogram" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .withColumn("bucket", floor(col("l_quantity") / 5).cast("long"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n"),
          min(col("l_quantity")).as("lo"),
          max(col("l_quantity")).as("hi"))
        .orderBy(col("bucket"))
    },

    // -- date/time scalars, second batch -------------------------------------
    "fn_datetime2" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          make_date(lit(1995), month(col("o_orderdate")), lit(15)).as("mid_month"),
          add_months(col("o_orderdate"), 2).as("plus2m"),
          weekofyear(col("o_orderdate")).cast("int").as("iso_week"),
          quarter(col("o_orderdate")).cast("int").as("q"),
          dayofweek(col("o_orderdate")).cast("int").as("dow"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_trunc("quarter", col("o_orderdate")).as("q_start"))
        .orderBy(col("o_orderkey"))
    },

    // -- null / NaN semantics -------------------------------------------------
    // NaN is constructed explicitly (big values become NaN) so isnan /
    // nanvl / null-vs-NaN distinctions are all exercised.
    "fn_null" -> { (s, dir) =>
      val nanny = when(col("value") > 250, lit(Double.NaN)).otherwise(col("value"))
      val holey = nullif(col("event_type"), lit("error"))
      Tables(s, dir, "events")
        .select(
          col("event_id"),
          isnan(nanny).as("is_nan"),
          nanvl(nanny, lit(-1.0)).as("nan_repaired"),
          holey.isNull.as("was_error"),
          nvl(holey, lit("(none)")).as("type_or_none"),
          nvl2(holey, lit("ok"), lit("err")).as("nvl2_class"))
        .orderBy(col("event_id"))
    },

    // -- ANSI-safe scalars (null on failure, never an error) -----------------
    "fn_try" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          // divide as DOUBLE on both sides: decimal division rounds to a
          // result scale that DuckDB's double division doesn't share
          try_divide(Oracle.out(Oracle.dec(col("o_totalprice"))),
            col("o_orderkey") % 10).as("per_digit"),
          // o_orderstatus is a letter on EVERY row, and TryEval's failure
          // path is exception-driven (~17 µs/row measured — 2.6 of this
          // query's 3.3 s at sf0.1). On a high-failure-rate column, guard
          // with a cheap regex so the exception path only runs on rows
          // that are at least all-digits. The guard must not CHANGE
          // try_cast semantics: up to 10 digits may still fit Int
          // (1000000000..2147483647), so the guarded branch uses
          // try_cast itself — overflowing 10-digit strings yield NULL
          // exactly as unguarded try_cast would, in-range ones keep
          // their value. 11+ SIGNIFICANT digits always overflow → the
          // guard's NULL is already try_cast's answer; leading zeros
          // are stripped by the 0* prefix so zero-padded numerics like
          // '00000000007' still reach try_cast (review finding: a plain
          // {1,10} length bound silently nulled those).
          when(trim(col("o_orderstatus")).rlike("^[+-]?0*[0-9]{1,10}$"),
            expr("try_cast(trim(o_orderstatus) AS INT)")).as("status_int"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_int"),
          try_element_at(split(col("o_orderpriority"), "-"), lit(3)).as("missing_part"))
        .orderBy(col("o_orderkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "win_ignore_nulls" ->
      """SELECT event_id, user_id, ts::TIMESTAMP AS ts,
        |CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v,
        |LAST_VALUE(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
        |  OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_struct" ->
      """SELECT p_partkey,
        |p_brand AS brand_back,
        |CAST(p_size + 1 AS INT) AS size_plus,
        |to_json({'brand': p_brand, 'size': CAST(p_size AS INT)}) AS sp_json
        |FROM part ORDER BY p_partkey""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(FLOOR(l_quantity / 5) AS BIGINT) AS bucket,
        |COUNT(*) AS n, MIN(l_quantity) AS lo, MAX(l_quantity) AS hi
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,

    "fn_datetime2" ->
      """SELECT o_orderkey,
        |make_date(1995, CAST(month(o_orderdate) AS INT), 15) AS mid_month,
        |CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        |CAST(quarter(o_orderdate) AS INT) AS q,
        |CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |strftime(o_orderdate, '%Y-%m') AS ym,
        |CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_null" ->
      """WITH t AS (
        |  SELECT event_id,
        |    CASE WHEN value > 250 THEN CAST('NaN' AS DOUBLE) ELSE value END AS nanny,
        |    NULLIF(event_type, 'error') AS holey
        |  FROM events)
        |SELECT event_id,
        |isnan(nanny) AS is_nan,
        |CASE WHEN isnan(nanny) THEN -1.0 ELSE nanny END AS nan_repaired,
        |holey IS NULL AS was_error,
        |COALESCE(holey, '(none)') AS type_or_none,
        |CASE WHEN holey IS NOT NULL THEN 'ok' ELSE 'err' END AS nvl2_class
        |FROM t ORDER BY event_id""".stripMargin,

    "fn_try" ->
      """SELECT o_orderkey,
        |CAST(CAST(o_totalprice AS DECIMAL(18,2)) / NULLIF(o_orderkey % 10, 0) AS DOUBLE) AS per_digit,
        |TRY_CAST(o_orderstatus AS INT) AS status_int,
        |TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_int,
        |string_split(o_orderpriority, '-')[3] AS missing_part
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
