package graft.queries

import graft.{Oracle, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set operations, multi-key sorts/limits, and top-k per group
  * (SURVEY.md §2.3 `set_*`, `sort_multi`, `topk_group`).
  *
  * Set ops are by-position in Spark (`union`), distinct variants add one
  * shuffle on the full row; top-k per group is a window + filter, which at
  * scale AQE executes as a single shuffle on the partition key (no global
  * sort).
  */
object SetSort {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- union all (by position, types aligned explicitly) -----------------
    "set_union_all" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(
        col("c_name").as("name"),
        Oracle.out(Oracle.dec(col("c_acctbal"))).as("acctbal"),
        lit("cust").as("tag"))
      val p = Tables(s, dir, "supplier").select(
        col("s_name").as("name"),
        Oracle.out(Oracle.dec(col("s_acctbal"))).as("acctbal"),
        lit("supp").as("tag"))
      Oracle.totalOrder(c.unionAll(p))
    },

    // -- union distinct ----------------------------------------------------
    "set_union_distinct" -> { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(Tables(s, dir, "supplier").select(col("s_nationkey")))
        .distinct()
        .orderBy(col("nationkey"))
    },

    // -- intersect (distinct semantics on both engines) --------------------
    "set_intersect" -> { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(Tables(s, dir, "supplier").select(col("s_nationkey")))
        .orderBy(col("nationkey"))
    },

    // -- except ------------------------------------------------------------
    // Suppliers restricted to high balances so the difference is non-empty
    // (suppliers otherwise cover every nation in the fixtures).
    "set_except" -> { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(Tables(s, dir, "supplier")
          .filter(col("s_acctbal") > 8000).select(col("s_nationkey")))
        .orderBy(col("nationkey"))
    },

    // -- bag-semantics set ops (ALL variants keep duplicates) --------------
    // suppliers' nation keys removed once-per-occurrence from customers'
    "set_except_all" -> { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .exceptAll(Tables(s, dir, "supplier").select(col("s_nationkey")))
        .orderBy(col("nationkey"))
    },

    "set_intersect_all" -> { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersectAll(Tables(s, dir, "supplier").select(col("s_nationkey")))
        .orderBy(col("nationkey"))
    },

    // -- multi-key sort + limit (global TakeOrderedAndProject) -------------
    // DESC first key with full ASC tiebreak so the LIMIT edge is
    // deterministic even with duplicate totalprice values.
    "sort_multi" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          Oracle.out(Oracle.dec(col("o_totalprice"))).as("totalprice"), col("o_orderdate"))
        .orderBy(col("totalprice").desc, col("o_orderkey").asc,
          col("o_custkey").asc, col("o_orderdate").asc)
        .limit(50)
    },

    // -- top-k per group (window row_number + filter) ----------------------
    // Total tiebreak (retailprice DESC, partkey, name) makes rank
    // assignment deterministic across engines.
    "topk_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc, col("p_name").asc)
      Tables(s, dir, "part")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_name"),
          Oracle.out(Oracle.dec(col("p_retailprice"))).as("retailprice"))
        .orderBy(col("p_brand"), col("rn"))
    }
  )

  val oracle: Map[String, String] = Map(
    "set_union_all" ->
      """SELECT * FROM (
        |  SELECT c_name AS name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
        |         'cust' AS tag FROM customer
        |  UNION ALL
        |  SELECT s_name, CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE), 'supp' FROM supplier)
        |ORDER BY name, acctbal, tag""".stripMargin,

    "set_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
        |ORDER BY nationkey""".stripMargin,

    "set_except_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT ALL SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "sort_multi" ->
      """SELECT o_orderkey, o_custkey,
        |CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice, o_orderdate
        |FROM orders
        |ORDER BY totalprice DESC, o_orderkey ASC, o_custkey ASC, o_orderdate ASC
        |LIMIT 50""".stripMargin,

    "topk_group" ->
      """SELECT p_brand, rn, p_partkey, p_name, retailprice FROM (
        |  SELECT p_brand, p_partkey, p_name,
        |         CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS retailprice,
        |         ROW_NUMBER() OVER (PARTITION BY p_brand
        |           ORDER BY p_retailprice DESC, p_partkey ASC, p_name ASC) AS rn
        |  FROM part)
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin
  )
}
