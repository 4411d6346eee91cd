package graft.queries

import graft.{Oracle, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join forms (SURVEY.md §2.3 `join_*`): equi (inner/outer/semi/anti),
  * broadcast, theta (inequality), range (interval), and as-of.
  *
  * Scale notes baked into each plan:
  *  - dimension joins use `broadcast()` or are small enough that Catalyst
  *    broadcasts them under the default 10 MB threshold — no shuffle of the
  *    fact side;
  *  - fact-fact equi joins shuffle on the join key once and aggregate
  *    map-side first where possible;
  *  - the range join avoids a nested-loop cross product by carrying an
  *    equi component (user_id) so Spark plans a hash/sort-merge join with
  *    a residual range filter — the standard interval-binning trick at
  *    100 TB;
  *  - the as-of join is expressed as candidate-join + per-left-row
  *    `row_number`, which AQE handles with skew splitting; a sort-merge
  *    formulation is the scale escalation path.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- inner equi-join ---------------------------------------------------
    "join_inner" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(
          col("o_orderkey"), col("c_name"),
          Oracle.out(Oracle.dec(col("o_totalprice"))).as("totalprice"),
          col("c_mktsegment"))
        .orderBy(col("o_orderkey"))
        .limit(100)
    },

    // -- 3-way join + aggregation (TPC-H Q3 flavour) -----------------------
    // lineitem is pre-aggregated per orderkey BEFORE the orders join (the
    // same rewrite join_left uses): the orderkey shuffle carries one row
    // per order instead of every line, and the per-order decimal partials
    // re-sum exactly. customer broadcasts.
    "join_multi" -> { (s, dir) =>
      val perOrder = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          sum(Oracle.revenue(col("l_extendedprice"), col("l_discount"))).as("rev"),
          count(lit(1)).as("nl"))
      perOrder
        .join(Tables(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"), "inner")
        .join(broadcast(Tables(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(
          Oracle.out(sum(col("rev"))).as("revenue"),
          sum(col("nl")).cast("long").as("n_lines"))
        .orderBy(col("c_mktsegment"))
    },

    // -- broadcast join of tiny dims ---------------------------------------
    "join_broadcast" -> { (s, dir) =>
      Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"), "inner")
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy(col("n_nationkey"))
    },

    // -- left outer + null-safe aggregation --------------------------------
    // Aggregate orders BEFORE the join (same result as join-then-group
    // since the group key is the join key): shuffles the pre-aggregated
    // per-customer rows instead of every order — the rewrite that matters
    // at fact-table scale.
    "join_left" -> { (s, dir) =>
      val perCust = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("o_n"),
          sum(Oracle.dec(col("o_totalprice"))).as("o_total"))
      Tables(s, dir, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("o_n"), lit(0L)).as("n_orders"),
          Oracle.out(coalesce(col("o_total"), lit(0).cast(Oracle.Money))).as("total"))
        .orderBy(col("c_custkey"))
    },

    // -- full outer (aggregate-then-join so both null sides can appear) ----
    "join_full" -> { (s, dir) =>
      val supp = Tables(s, dir, "supplier")
        .filter(col("s_acctbal") > 5000)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(Oracle.dec(col("s_acctbal"))).as("supp_bal"))
      val cust = Tables(s, dir, "customer")
        .filter(col("c_acctbal") > 5000)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(Oracle.dec(col("c_acctbal"))).as("cust_bal"))
      supp.join(cust, col("s_nationkey") === col("c_nationkey"), "full_outer")
        .select(
          coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          col("n_supp"), Oracle.out(col("supp_bal")).as("supp_bal"),
          col("n_cust"), Oracle.out(col("cust_bal")).as("cust_bal"))
        .orderBy(col("nationkey"))
    },

    // -- left semi (EXISTS) ------------------------------------------------
    "join_semi" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .join(
          Tables(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // -- left anti (NOT EXISTS) --------------------------------------------
    // Against 'P'-status orders (every customer has SOME order in the
    // fixtures, so the unfiltered anti join would be vacuously empty).
    "join_anti" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .join(
          Tables(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // -- theta join (inequality, equi component on brand) ------------------
    // Same-brand pairs where p1 is strictly smaller: hash join on p_brand
    // with a residual p_size comparison — NOT a cross product.
    "join_theta" -> { (s, dir) =>
      val p = Tables(s, dir, "part")
      val p1 = p.select(col("p_brand").as("brand"), col("p_size").as("size1"))
      val p2 = p.select(col("p_brand").as("brand2"), col("p_size").as("size2"))
      p1.join(p2, col("brand") === col("brand2") && col("size1") < col("size2"), "inner")
        .groupBy(col("brand"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("brand"))
    },

    // -- theta join, aggregate rewrite (round 10) --------------------------
    // join_theta's scale path: the output is COUNT-only, so the
    // quadratic pair space never needs to materialize — per (brand,
    // size) histogram counts c give n_pairs = (T² − Σc²)/2 exactly
    // (T = Σc; the numerator is even by construction, and doubles are
    // exact to 2^53 ≫ any realistic per-brand total²). 798 s → ~2 s at
    // 100×. The DuckDB oracle still runs the PLAIN theta join, so the
    // hash-identical PASS is the equivalence proof; join_theta itself
    // stays registered as the declared non-equi/BNL surface.
    "join_theta_agg" -> { (s, dir) =>
      Tables(s, dir, "part")
        .groupBy(col("p_brand").as("brand"), col("p_size"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("brand"))
        .agg(((sum(col("c")) * sum(col("c")) - sum(col("c") * col("c"))) / 2)
          .cast("long").as("n_pairs"))
        // the inner theta join emits NO row for a brand with no
        // qualifying pair (single part, or all p_size equal) — drop
        // n_pairs=0 brands so the identity matches the join exactly
        // on ANY data, not just fixtures with ≥2 distinct sizes
        .filter(col("n_pairs") > 0)
        .orderBy(col("brand"))
    },

    // -- range (interval) join ---------------------------------------------
    // For each 'error' event, count events by the same user within the
    // following hour (self-pair included). Equi on user_id keeps this a
    // hash join; the [ts, ts+1h) bound is a residual filter.
    "join_range" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val errs = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("u"), col("ts").as("t0"))
      val all = ev.select(col("user_id").as("u2"), col("ts").as("t1"))
      errs.join(all,
          col("u") === col("u2") &&
          col("t1") >= col("t0") &&
          col("t1") < col("t0") + expr("INTERVAL 1 HOUR"),
          "inner")
        .groupBy(col("u").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    },

    // -- range join WITHOUT an equi key (binned) -----------------------------
    // For each 'error' event: how many events — ANY user — land in the
    // following hour. No equi component exists, so the naive plan is a
    // nested loop; the binning rewrite (graft.operators.RangeJoin) makes
    // it a hash join on the time bucket. Oracle runs the plain theta
    // join — same rows, quadratic plan only on DuckDB's side.
    "join_range_binned" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("t0"))
      graft.operators.RangeJoin.window(
          errs, col("t0"),
          ev.select(col("ts").as("t1")), col("t1"),
          windowSeconds = 3600L)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_nearby"))
        .orderBy(col("err_id"))
    },

    // -- interval OVERLAP join (no equi key, binned) ------------------------
    // Each error's 10-minute interval against each click's: pairs whose
    // intervals intersect, with NO shared key — the naive plan is a
    // nested loop. graft.operators.RangeJoin.overlap bins BOTH sides
    // (multi-bin replication + dedup, unlike the point-in-window form)
    // into a hash join on the bin id. Oracle runs the plain theta join.
    "join_overlap" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("e0"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("e1"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("c0"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("c1"))
      graft.operators.RangeJoin.overlap(
          errs, "err_id", col("e0"), col("e1"),
          clicks, "click_id", col("c0"), col("c1"), binSeconds = 600L)
        .groupBy(col("err_id")).agg(count(lit(1)).as("n_overlap"))
        .orderBy(col("err_id"))
    },

    // -- as-of join, native plan form ---------------------------------------
    // Same semantics as join_asof below, but planned as the custom
    // single-pass sort-merge operator (marker predicate → strategy →
    // AsOfJoinExec; graft.plans.AsOfJoinPlan) — one shuffle+sort per
    // side, no candidate materialisation. Checked against the SAME
    // DuckDB oracle as the window form.
    "join_asof_native" -> { (s, dir) =>
      graft.plans.Asof.register(s)
      graft.plans.Asof.join(
        Tables(s, dir, "events").select(col("event_id"), col("user_id"), col("ts")),
        Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        leftKey = col("user_id"), rightKey = col("o_custkey"),
        leftTime = col("ts"), rightTime = col("o_orderdate"),
        rightTieBreak = col("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("event_id"))
    },

    // -- as-of join ---------------------------------------------------------
    // For each event, the latest order of the same user with
    // o_orderdate <= ts (ties broken by highest o_orderkey). Candidate
    // equi-join on the user key, then row_number()=1 per event.
    "join_asof" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      ev.join(ord,
          col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"),
          "inner")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("event_id"))
    },

    // -- as-of join, FORWARD direction --------------------------------------
    // For each order, the EARLIEST event of the same customer with
    // ts >= o_orderdate (ties broken by lowest event_id) — the
    // "first activity after this moment" direction; same candidate
    // equi-join + per-left-row row_number shape as the backward form.
    // (Direction is order→event because the fixture's events all
    // POST-date its orders — the event→order forward join is empty.)
    "join_asof_fwd" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("ts").asc, col("event_id").asc)
      ord.join(ev,
          col("o_custkey") === col("user_id") && col("ts") >= col("o_orderdate"),
          "inner")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("event_id"), col("ts"))
        .orderBy(col("o_orderkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "join_inner" ->
      """SELECT o_orderkey, c_name,
        |CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,

    "join_multi" ->
      s"""SELECT c_mktsegment,
         |CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
         |COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "join_left" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
        |CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "join_full" ->
      """WITH supp AS (
        |  SELECT s_nationkey, COUNT(*) AS n_supp,
        |         SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS supp_bal
        |  FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey),
        |cust AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust,
        |         SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS cust_bal
        |  FROM customer WHERE c_acctbal > 5000 GROUP BY c_nationkey)
        |SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
        |       n_supp, CAST(supp_bal AS DOUBLE) AS supp_bal,
        |       n_cust, CAST(cust_bal AS DOUBLE) AS cust_bal
        |FROM supp FULL OUTER JOIN cust ON s_nationkey = c_nationkey
        |ORDER BY nationkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "join_theta" ->
      """SELECT p1.p_brand AS brand, COUNT(*) AS n_pairs
        |FROM part p1 JOIN part p2
        |  ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
        |GROUP BY p1.p_brand ORDER BY brand""".stripMargin,

    // deliberately the SAME theta-join text as join_theta — the
    // independent formulation proving the histogram rewrite
    "join_theta_agg" ->
      """SELECT p1.p_brand AS brand, COUNT(*) AS n_pairs
        |FROM part p1 JOIN part p2
        |  ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
        |GROUP BY p1.p_brand ORDER BY brand""".stripMargin,

    "join_range" ->
      """SELECT e1.user_id, COUNT(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts::TIMESTAMP >= e1.ts::TIMESTAMP
        | AND e2.ts::TIMESTAMP < e1.ts::TIMESTAMP + INTERVAL 1 HOUR
        |WHERE e1.event_type = 'error'
        |GROUP BY e1.user_id ORDER BY e1.user_id""".stripMargin,

    "join_range_binned" ->
      """SELECT e1.event_id AS err_id, COUNT(*) AS n_nearby
        |FROM events e1 JOIN events e2
        |  ON e2.ts::TIMESTAMP >= e1.ts::TIMESTAMP
        | AND e2.ts::TIMESTAMP < e1.ts::TIMESTAMP + INTERVAL 1 HOUR
        |WHERE e1.event_type = 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "join_asof_native" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts::TIMESTAMP)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "join_asof" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts::TIMESTAMP)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "join_overlap" ->
      """SELECT e.event_id AS err_id, COUNT(*) AS n_overlap
        |FROM events e JOIN events c
        |  ON e.event_type = 'error' AND c.event_type = 'click'
        | AND e.ts::TIMESTAMP < c.ts::TIMESTAMP + INTERVAL '10 minutes'
        | AND c.ts::TIMESTAMP < e.ts::TIMESTAMP + INTERVAL '10 minutes'
        |GROUP BY e.event_id ORDER BY err_id""".stripMargin,

    "join_asof_fwd" ->
      """SELECT o_orderkey, o_custkey, event_id, ts FROM (
        |  SELECT o.o_orderkey, o.o_custkey, e.event_id, e.ts::TIMESTAMP AS ts,
        |         ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
        |           ORDER BY e.ts::TIMESTAMP ASC, e.event_id ASC) AS rn
        |  FROM orders o JOIN events e
        |    ON o.o_custkey = e.user_id AND e.ts::TIMESTAMP >= o.o_orderdate)
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin
  )
}
