package graft.queries

import graft.{Oracle, Tables}
import graft.functions.Geo
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.3 `fn_*`, `geo_bearing_range`).
  *
  * Everything here is built-in `org.apache.spark.sql.functions` — fully
  * codegen'd, no UDFs in the hot path. Cross-engine parity rules:
  * explicit casts where DuckDB's return types differ (year→BIGINT,
  * floor→DOUBLE, sign→TINYINT), `round(…,4..6)` on every float output,
  * float arrays cast to double BEFORE folding.
  *
  * The geo scalars reproduce the reference's formulas exactly
  * (task.ts:14-27 initial bearing incl. `(b+360)%360` normalisation;
  * task.ts:37-50 haversine with R=6371000 m) as native column
  * expressions — see [[Geo]].
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- string scalars ----------------------------------------------------
    "fn_string" -> { (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_type")).as("lo"),
          substring(col("p_name"), 1, 5).as("sub5"),
          length(col("p_name")).as("len"),
          trim(col("p_name")).as("trimmed"),
          regexp_replace(col("p_name"), lit(" "), lit("_")).as("replaced"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          concat(col("p_brand"), lit(":"), col("p_name")).as("branded"),
          lpad(col("p_size").cast("string"), 5, "0").as("padded"))
        .orderBy(col("p_partkey"))
    },

    // -- date/time scalars --------------------------------------------------
    "fn_date" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_orderdate"),
          year(col("o_orderdate")).cast("int").as("y"),
          month(col("o_orderdate")).cast("int").as("m"),
          dayofmonth(col("o_orderdate")).cast("int").as("d"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1995-01-01")))
            .cast("int").as("days_since"),
          (col("o_orderdate") + expr("INTERVAL 3 MONTH")).as("plus3m"),
          last_day(col("o_orderdate")).as("month_end"))
        .orderBy(col("o_orderkey"))
    },

    // -- math scalars --------------------------------------------------------
    "fn_math" -> { (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).cast("int").as("abs_v"),
          round(sqrt(col("p_retailprice")), 4).as("sqrt_v"),
          round(log(col("p_retailprice")), 4).as("ln_v"),
          round(pow(col("p_size").cast("double"), 2), 4).as("pow_v"),
          (col("p_size") % 7).cast("int").as("mod_v"),
          floor(col("p_retailprice") / 100).cast("long").as("floor_v"),
          ceil(col("p_retailprice") / 100).cast("long").as("ceil_v"),
          signum(col("p_size").cast("double") - 25).cast("int").as("sign_v"))
        .orderBy(col("p_partkey"))
    },

    // -- JSON extraction + aggregate -----------------------------------------
    // ONE from_json with an explicit schema (single codegen-friendly parse
    // per row) — get_json_object would re-parse the document per extracted
    // path (9.3 s at sf0.1 in round 1).
    "fn_json" -> { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), "k INT", Map.empty[String, String])
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("k")).cast("long").as("sum_k"),
          round(avg(col("k")), 4).as("avg_k"),
          count(col("k")).as("n"))
        .orderBy(col("event_type"))
    },

    // -- array scalars (embeddings) ------------------------------------------
    // Float elements are cast to double BEFORE the fold so both engines
    // accumulate in double (DuckDB list_sum on FLOAT[] accumulates in
    // float — verified mismatch).
    "fn_array" -> { (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("n_dims"),
          round(element_at(col("embedding"), 1).cast("double"), 5).as("first_dim"),
          // float array serialized to fixed "%.5f" CSV text: the driver's
          // comparator can't sort raw arrays, and the engines' shortest-
          // double printers are not guaranteed to agree digit-for-digit.
          array_join(transform(slice(col("embedding"), 1, 3),
            (x: Column) => format_string("%.5f", x.cast("double"))), ",")
            .as("head3"),
          round(aggregate(
            transform(col("embedding"), (x: Column) => x.cast("double")),
            lit(0.0), (acc: Column, x: Column) => acc + x), 4).as("sum_dims"))
        .orderBy(col("vec_id"))
    },

    // -- map type. The OUTPUT is map-free (keys/values arrays + lookup),
    //    so it oracle-checks fine — only a raw MAP column in the result
    //    would be fragile across engines.
    "fn_map" -> { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          from_json(col("props"), "k INT", Map.empty[String, String])
            .getField("k").as("k"))
        .select(col("event_id"),
          map(lit("type_len"), length(col("event_type")).cast("int"),
              lit("k"), col("k")).as("m"))
        .select(
          col("event_id"),
          Oracle.json(map_keys(col("m"))).as("ks"),
          Oracle.json(map_values(col("m"))).as("vs"),
          element_at(col("m"), "k").as("k_back"))
        .orderBy(col("event_id"))
    },

    // -- geo scalars (reference parity R10/R11) ------------------------------
    "geo_bearing_range" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      // Deterministic synthetic coordinates from integer keys (exact in
      // double on both engines).
      val lat1 = (col("c_custkey") % 17).cast("double") * 10 - 80
      val lon1 = (col("c_custkey") % 35).cast("double") * 10 - 170
      val lat2 = ((col("c_custkey") + 7) % 17).cast("double") * 10 - 80
      val lon2 = ((col("c_custkey") + 13) % 35).cast("double") * 10 - 170
      c.select(
          col("c_custkey"),
          lat1.as("lat1"), lon1.as("lon1"), lat2.as("lat2"), lon2.as("lon2"),
          round(Geo.initialBearing(lat1, lon1, lat2, lon2), 4).as("bearing"),
          round(Geo.haversineMeters(lat1, lon1, lat2, lon2), 4).as("range_m"))
        .orderBy(col("c_custkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey, UPPER(p_name) AS up, LOWER(p_type) AS lo,
        |SUBSTRING(p_name, 1, 5) AS sub5, LENGTH(p_name) AS len,
        |TRIM(p_name) AS trimmed,
        |REGEXP_REPLACE(p_name, ' ', '_', 'g') AS replaced,
        |REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
        |CONCAT(p_brand, ':', p_name) AS branded,
        |LPAD(CAST(p_size AS VARCHAR), 5, '0') AS padded
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey, o_orderdate,
        |CAST(year(o_orderdate) AS INT) AS y,
        |CAST(month(o_orderdate) AS INT) AS m,
        |CAST(day(o_orderdate) AS INT) AS d,
        |CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since,
        |o_orderdate + INTERVAL 3 MONTH AS plus3m,
        |last_day(o_orderdate) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT p_partkey,
        |CAST(ABS(p_size - 25) AS INT) AS abs_v,
        |ROUND(SQRT(p_retailprice), 4) AS sqrt_v,
        |ROUND(LN(p_retailprice), 4) AS ln_v,
        |ROUND(POW(CAST(p_size AS DOUBLE), 2), 4) AS pow_v,
        |CAST(p_size % 7 AS INT) AS mod_v,
        |CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS floor_v,
        |CAST(CEIL(p_retailprice / 100) AS BIGINT) AS ceil_v,
        |CAST(SIGN(CAST(p_size AS DOUBLE) - 25) AS INT) AS sign_v
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_json" ->
      """SELECT event_type,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
        |COUNT(json_extract_string(props, '$.k')) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "fn_array" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
        |ROUND(CAST(embedding[1] AS DOUBLE), 5) AS first_dim,
        |array_to_string(list_transform(embedding[1:3],
        |  x -> printf('%.5f', CAST(x AS DOUBLE))), ',') AS head3,
        |ROUND(list_sum(CAST(embedding AS DOUBLE[])), 4) AS sum_dims
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "fn_map" ->
      """SELECT event_id,
        |to_json(['type_len', 'k']) AS ks,
        |to_json([CAST(LENGTH(event_type) AS INT),
        |         CAST(json_extract_string(props, '$.k') AS INT)]) AS vs,
        |CAST(json_extract_string(props, '$.k') AS INT) AS k_back
        |FROM events ORDER BY event_id""".stripMargin,

    "geo_bearing_range" ->
      s"""WITH pts AS (
         |  SELECT c_custkey,
         |    CAST(c_custkey % 17 AS DOUBLE) * 10 - 80 AS lat1,
         |    CAST(c_custkey % 35 AS DOUBLE) * 10 - 170 AS lon1,
         |    CAST((c_custkey + 7) % 17 AS DOUBLE) * 10 - 80 AS lat2,
         |    CAST((c_custkey + 13) % 35 AS DOUBLE) * 10 - 170 AS lon2
         |  FROM customer)
         |SELECT c_custkey, lat1, lon1, lat2, lon2,
         |ROUND(fmod(degrees(atan2(
         |    sin(radians(lon2 - lon1)) * cos(radians(lat2)),
         |    cos(radians(lat1)) * sin(radians(lat2))
         |      - sin(radians(lat1)) * cos(radians(lat2)) * cos(radians(lon2 - lon1))
         |  )) + 360, 360), 4) AS bearing,
         |ROUND(2 * 6371000 * atan2(
         |    sqrt(sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
         |      + cos(radians(lat1)) * cos(radians(lat2))
         |        * sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2)),
         |    sqrt(1 - (sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
         |      + cos(radians(lat1)) * cos(radians(lat2))
         |        * sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2)))
         |  ), 4) AS range_m
         |FROM pts ORDER BY c_custkey""".stripMargin
  )
}
