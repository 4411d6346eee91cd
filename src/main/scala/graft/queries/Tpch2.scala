package graft.queries

import graft.{Oracle, Tables}
import graft.sources.Bucketed
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second TPC-H wave: the subquery-heavy shapes (Q2/Q9/Q11/Q16/Q20) the
  * first wave left out, adapted to the fixture star schema — it has no
  * `partsupp`, so the distinct `(l_partkey, l_suppkey)` pairs of lineitem
  * stand in for the supplier-part relation, and `s_acctbal < 0` stands in
  * for Q16's complaint-comment suppliers. Each query keeps the original's
  * signature plan problem: correlated min (Q2), multi-dim join roll-up
  * (Q9), global-fraction scalar subquery (Q11), NOT-IN + COUNT DISTINCT
  * (Q16), nested half-sum semi-join (Q20).
  *
  * Plus `join_bucketed`: the orderkey fact-fact join over pre-bucketed
  * layouts ([[graft.sources.Bucketed]]) — the zero-exchange join every
  * repeated 100 TB pipeline should run; gate in ScaleJoinSpec asserts no
  * exchange touches the join key.
  */
object Tpch2 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- Q2 shape: cheapest supplier per part in one region ---------------
    // Correlated-min subquery, decorrelated as a per-part window min over
    // the region-filtered supply (one shuffle on partkey; a groupBy-min +
    // join-back would scan supply twice). `cost` is compared, never
    // arithmetic'd, so double min/equality is engine-exact.
    "tpch_q2" -> { (s, dir) =>
      val supply = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part")
          .filter(col("p_type") === "LARGE" && col("p_size") <= 15),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("p_brand"), col("s_name"),
          col("s_acctbal"), col("n_name"), col("l_extendedprice").as("cost"))
      supply
        .withColumn("mincost", min(col("cost")).over(Window.partitionBy(col("p_partkey"))))
        .filter(col("cost") === col("mincost"))
        // Dedup BEFORE the projection instead of a result-wide distinct
        // over renamed outputs (r5 advice): the key set carries every
        // output column and CONTAINS the window's partition key
        // p_partkey, so the aggregate reuses the window's hash
        // partitioning: zero extra exchange (PlanSpec gate), where the
        // old post-projection distinct() reshuffled the whole result.
        // NOTE (r6 advice): because s_suppkey is in the key set but NOT
        // in the output, this equals a result-wide DISTINCT only under
        // the fixture invariant that s_suppkey functionally determines
        // s_name/s_acctbal/n_name (TPC-H supplier rows do: s_name is
        // suppkey-derived). Two suppliers identical on every visible
        // column would emit two rows here where DISTINCT emits one —
        // the oracle SQL dedups on the same 7-column key in lockstep,
        // so the gate holds by construction, not by accident.
        .dropDuplicates("p_partkey", "s_suppkey", "p_brand", "s_name",
          "s_acctbal", "n_name", "cost")
        // s_suppkey as the final key makes the pre-LIMIT order provably
        // total (two min-cost suppliers of one part could share acctbal
        // AND name); projected away after the cut, as in the oracle.
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"), col("s_suppkey"))
        .limit(100)
        .select(col("s_acctbal").as("acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"), col("cost"))
    },

    // -- Q9 shape: profit per supplying nation per ship-year --------------
    // (No ps_supplycost in the fixture: profit = revenue.) part/supplier
    // joins are UNhinted: those dims scale with SF (ScaleUp replicates
    // them), so the planner must stay free to fall back to a shuffle join
    // past the broadcast threshold — a broadcast() hint would override it
    // unconditionally all the way to driver OOM. Only the fixed-size
    // nation/region dims and one-row totals keep explicit hints.
    "tpch_q9" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part").filter(col("p_name").like("%red%")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).cast("int").as("o_year"))
        .agg(Oracle.out(sum(Oracle.revenue(col("l_extendedprice"), col("l_discount")))).as("profit"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // -- Q11 shape: parts above a fixed fraction of regional value --------
    // The scalar subquery (grand total) and the HAVING probe share ONE
    // per-part aggregate via cache() — same single-pass materialisation
    // argument as tpch_q15 (Extra3.scala): the saved lineitem pass grows
    // with data, the supplier-sized constant does not. The fraction
    // compares decimal×int against the exact decimal total, so the
    // boundary is bit-identical on both engines.
    "tpch_q11" -> { (s, dir) =>
      val perPart = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(Oracle.revenue(col("l_extendedprice"), col("l_discount"))).as("pv"))
        .cache()
      val total = perPart.agg(sum(col("pv")).as("tv"))
      perPart.crossJoin(broadcast(total))
        .filter(col("pv") * 10000 > col("tv"))
        .select(col("partkey"), Oracle.out(col("pv")).as("value"))
        .orderBy(col("value").desc, col("partkey"))
    },

    // -- Q16 shape: supplier count per part descriptor, excluding bad
    // suppliers (NOT IN → anti-join, broadcast-picked by the planner at
    // any SF where badSupp fits; both key columns are non-null, the
    // regime where anti-join IS NOT IN). The distinct supplier-part pairs
    // are taken AFTER the selective part join, so only surviving parts'
    // pairs shuffle.
    "tpch_q16" -> { (s, dir) =>
      val badSupp = Tables(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(Tables(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" && !col("p_type").like("PROMO%") &&
            col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)),
          col("l_partkey") === col("p_partkey"))
        .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
        .distinct()
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // -- Q20 shape: suppliers shipping excess volume of 'small' parts -----
    // Inner nested aggregate (per supplier-part half-sum HAVING) reduced
    // to a tiny suppkey set, then a SEMI join against one nation's
    // suppliers (both scale-dependent sides unhinted — AQE broadcasts the
    // reduced set at runtime). l_quantity is integral-valued double: sums
    // are exact, so the >40 boundary is engine-identical.
    "tpch_q20" -> { (s, dir) =>
      val smallParts = Tables(s, dir, "part")
        .filter(col("p_name").like("small%")).select(col("p_partkey"))
      val bigSupply = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 40)
        .select(col("l_suppkey")).distinct()
      Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(bigSupply, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal").as("acctbal"))
        .orderBy(col("s_name"))
    },

    // -- bucketed fact-fact join: the pay-layout-once orderkey join -------
    // Both sides come from Bucketed (pre-hashed + pre-sorted on the join
    // key, one file per bucket): the join itself needs NO exchange — the
    // only shuffles left are the 5-group roll-up and the final order.
    // (The partition-local merge Sort stays by default: Spark 3+ ignores
    // write-time sortBy at scan time, SPARK-28632; ScaleJoinSpec shows it
    // eliding under the legacy outputOrdering flag and gates that the key
    // never re-partitions.)
    "join_bucketed" -> { (s, dir) =>
      val o = Bucketed.table(s, dir, "orders", "o_orderkey",
        Seq("o_orderkey", "o_orderpriority"))
      val l = Bucketed.table(s, dir, "lineitem", "l_orderkey",
        Seq("l_orderkey", "l_extendedprice", "l_discount"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(Oracle.out(sum(Oracle.revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderpriority"))
    }
  )

  val oracle: Map[String, String] = Map(
    "tpch_q2" ->
      """WITH supply AS (
        |  SELECT p_partkey, s_suppkey, p_brand, s_name, s_acctbal, n_name,
        |         l_extendedprice AS cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 15),
        |cut AS (
        |  SELECT DISTINCT p_partkey, s_suppkey, p_brand, s_name, s_acctbal, n_name, cost
        |  FROM (SELECT *, MIN(cost) OVER (PARTITION BY p_partkey) AS mincost FROM supply)
        |  WHERE cost = mincost
        |  ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey LIMIT 100)
        |SELECT s_acctbal AS acctbal, s_name, n_name, p_partkey, p_brand, cost FROM cut""".stripMargin,

    "tpch_q9" ->
      s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
         |CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS profit,
         |COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "tpch_q11" ->
      s"""WITH filt AS (
         |  SELECT l_partkey, ${Oracle.revenueSql("l_extendedprice", "l_discount")} AS v
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA')
         |SELECT l_partkey AS partkey, CAST(SUM(v) AS DOUBLE) AS value
         |FROM filt GROUP BY l_partkey
         |HAVING SUM(v) * 10000 > (SELECT SUM(v) FROM filt)
         |ORDER BY value DESC, partkey""".stripMargin,

    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "tpch_q20" ->
      """SELECT s_name, s_acctbal AS acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3' AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey HAVING SUM(l_quantity) > 40)
        |ORDER BY s_name""".stripMargin,

    "join_bucketed" ->
      s"""SELECT o_orderpriority,
         |CAST(SUM(${Oracle.revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
         |COUNT(*) AS n_lines
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
