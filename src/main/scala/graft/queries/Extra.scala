package graft.queries

import graft.{Oracle, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave coverage (SURVEY.md §2.3 extension rows): exact
  * percentiles, first/last/nth window values, conditional scalars,
  * bitwise scalars, cross join, SQL-text subqueries, character-n-gram
  * near-dup and n-gram counting.
  */
object Extra {
  type Q = (SparkSession, String) => DataFrame

  /** doc_id + distinct lowercase character 4-grams, bounded to doc_id <
    * 500 (= every doc at sf0.01, a fixed slice above). The synthetic corpus has a ~30-word vocabulary, so only ~985
    * distinct 4-grams exist and the gram self-join degenerates (measured
    * 1.9e9 intermediate pairs at sf0.1 unbounded). Real corpora don't
    * share grams like this; at scale the answer is MinHash over gram
    * sets (`dedup_minhash`), not the exact join.
    */
  private def charGrams(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 4)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), length(col("t")) - 3),
          i => col("t").substr(i, lit(4)))).as("s"))
      .distinct()

  val queries: Map[String, Q] = Map(
    // -- exact percentiles (sort-based; interpolating like SQL
    //    PERCENTILE_CONT) -------------------------------------------------
    "agg_percentile" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("price_p25"))
        .orderBy(col("l_returnflag"))
    },

    // -- boolean / conditional aggregates -----------------------------------
    "agg_bool" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          bool_and(col("value") > 0).as("all_positive"),
          bool_or(col("value") > 400).as("any_large"),
          count_if(col("value") > 100).as("n_over_100"),
          // Duplicate values exist → argmax must carry a unique tiebreak.
          // value·1e9 + event_id is exact in double (ulp ≪ 1 at this
          // magnitude) and orders by (value, event_id) on both engines.
          max_by(col("event_id"), col("value") * 1e9 + col("event_id")).as("id_of_max"),
          min_by(col("event_id"), col("value") * 1e9 - col("event_id")).as("id_of_min"))
        .orderBy(col("event_type"))
    },

    // -- correlation / covariance -------------------------------------------
    "agg_corr" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          // covar magnitude ~1e5: round(…,2) keeps well clear of the
          // engines' differing co-moment accumulation orders.
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
          round(var_samp(col("l_quantity")), 4).as("var_q"))
        .orderBy(col("l_returnflag"))
    },

    // -- cryptographic hash scalars ------------------------------------------
    "fn_hash" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .select(
          col("c_custkey"),
          md5(col("c_name")).as("name_md5"),
          sha2(col("c_name"), 256).as("name_sha256"),
          length(md5(col("c_name"))).as("md5_len"))
        .orderBy(col("c_custkey"))
    },

    // -- first/last/nth window values --------------------------------------
    "win_first_last" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          Oracle.out(first(Oracle.dec(col("o_totalprice"))).over(w)).as("first_price"),
          Oracle.out(last(Oracle.dec(col("o_totalprice"))).over(w)).as("last_price"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },

    // -- conditional scalars -----------------------------------------------
    "fn_cond" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("size_class"),
          nullif(col("o_orderstatus"), lit("O")).as("non_open_status"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open"),
          Oracle.out(least(Oracle.dec(col("o_totalprice")), lit(150000).cast(Oracle.Money))).as("capped"),
          Oracle.out(greatest(Oracle.dec(col("o_totalprice")), lit(1000).cast(Oracle.Money))).as("floored"))
        .orderBy(col("o_orderkey"))
    },

    // -- bitwise scalars ----------------------------------------------------
    "fn_bitwise" -> { (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          (col("p_size").bitwiseAND(lit(12))).cast("int").as("band"),
          (col("p_size").bitwiseOR(lit(5))).cast("int").as("bor"),
          (col("p_size").bitwiseXOR(lit(21))).cast("int").as("bxor"),
          shiftleft(col("p_size"), 2).cast("int").as("shl"),
          shiftright(col("p_size"), 1).cast("int").as("shr"),
          call_function("bit_count", col("p_size")).cast("int").as("popcnt"))
        .orderBy(col("p_partkey"))
    },

    // -- cross join (explicit cartesian of two small dims) -------------------
    "join_cross" -> { (s, dir) =>
      Tables(s, dir, "region").crossJoin(Tables(s, dir, "nation"))
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
        .orderBy(col("r_regionkey"), col("n_nationkey"))
    },

    // -- SQL-text path with scalar + correlated subqueries -------------------
    // Exercises spark.sql() end to end: the engine accepts the same SQL a
    // reference user would write.
    "sql_subquery" -> { (s, dir) =>
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey, c_name,
          |       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
          |FROM customer_v
          |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_v)
          |  AND EXISTS (SELECT 1 FROM orders_v
          |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    },

    // -- SQL-text path with chained CTEs -------------------------------------
    // The WITH-clause surface (sql_subquery covers scalar/correlated
    // subqueries); IDENTICAL SQL text runs on both engines.
    "sql_cte" -> { (s, dir) =>
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v2")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v2")
      s.sql(
        """WITH seg AS (
          |  SELECT c_custkey, c_mktsegment FROM customer_v2),
          |big AS (
          |  SELECT o_custkey, COUNT(*) AS n FROM orders_v2
          |  WHERE o_totalprice > 200000 GROUP BY o_custkey)
          |SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS n_big,
          |       COUNT(*) AS n_cust
          |FROM seg JOIN big ON c_custkey = o_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    },

    // -- character-n-gram Jaccard near-dup (n-gram flavour of
    //    dedup_neardup; robust to tokenisation differences) ---------------
    "dedup_ngram" -> { (s, dir) =>
      // g persisted for the sizes + self-join consumers, released by the
      // eager checkpoint (the LlmOps.nearDupPairs discipline: the gram
      // relation is the pipeline's largest intermediate, the pair output
      // its smallest).
      val g = charGrams(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = g.alias("a")
        .join(g.alias("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("i"))
      val out =
        try inter
          .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
          .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
          .withColumn("jac", round(col("i") / (col("n1") + col("n2") - col("i")), 6))
          .filter(col("jac") >= 0.6)
          .select(col("d1"), col("d2"), col("jac"))
          .localCheckpoint()
        finally { g.unpersist(false); () }
      out.orderBy(col("d1"), col("d2"))
    },

    // -- string scalars, second batch ---------------------------------------
    "fn_string2" -> { (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          levenshtein(col("p_name"), lit("small ring")).cast("int").as("lev"),
          split_part(col("p_name"), lit(" "), lit(1)).as("first_part"),
          instr(col("p_name"), "ring").cast("int").as("pos_ring"),
          repeat(col("p_brand"), 2).as("brand2x"),
          reverse(col("p_name")).as("rev"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
          regexp_like(col("p_name"), lit("ring|bolt")).as("has_ring_bolt"),
          size(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0)))
            .cast("int").as("vowel_runs"))
        .orderBy(col("p_partkey"))
    },

    // -- array scalars, second batch (order-normalised: Spark
    //    array_distinct keeps first-occurrence order while DuckDB
    //    list_distinct doesn't guarantee one — both sides sort) ----------
    // Order-then-project + materialize-once: the original projected SIX
    // separate evaluations of split(lower(text)) (plus three of the
    // sorted distinct vocab) under a global sort that evaluates its
    // input twice — toks and the sorted vocab now materialize once each,
    // above the Sort.
    "fn_array2" -> { (s, dir) =>
      val toks = split(lower(col("text")), " ")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), col("toks"),
          array_sort(array_distinct(col("toks"))).as("sv"))
        .select(
          col("doc_id"),
          // string arrays serialized via to_json (driver's comparator
          // can't sort raw arrays; JSON text is engine-identical here)
          Oracle.json(col("sv")).as("vocab"),
          size(col("sv")).as("n_distinct"),
          array_contains(col("toks"), "the").as("has_the"),
          Oracle.json(flatten(array(slice(col("toks"), 1, 2),
            slice(col("toks"), 3, 2)))).as("head4"),
          array_max(col("sv")).as("max_tok"),
          array_min(col("sv")).as("min_tok"))
    },

    // -- collection aggregates (collect_list / collect_set) -----------------
    // Collected arrays are sorted + sliced before serialization: Spark's
    // collection order is partition-dependent, so only the sorted form is
    // deterministic (and the slice keeps oracle cells bounded).
    "agg_collect" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          size(collect_set(col("user_id"))).cast("int").as("n_users"),
          graft.Oracle.json(slice(array_sort(collect_set(col("user_id"))), 1, 20))
            .as("first_users"),
          graft.Oracle.json(slice(array_sort(collect_list(col("user_id"))), 1, 5))
            .as("first_ids"))
        .orderBy(col("event_type"))
    },

    // -- unpivot (wide → long; the inverse of pivot_wide) --------------------
    "pivot_long" -> { (s, dir) =>
      Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice").cast("double").as("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "val")
        .orderBy(col("p_partkey"), col("metric"))
    },

    // -- top character trigrams ---------------------------------------------
    "text_ngram" -> { (s, dir) =>
      // spread: the trigram explode + partial count is ~the whole query
      // and the fixture scan plans one task (round-18, Tables.spread)
      graft.Tables.spread(Tables(s, dir, "documents").select(col("text")))
        .select(lower(col("text")).as("t"))
        .filter(length(col("t")) >= 3)
        .select(explode(transform(
          sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3)))).as("gram"))
        .groupBy(col("gram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram").asc)
        .limit(20)
    }
  )

  val oracle: Map[String, String] = Map(
    "agg_percentile" ->
      """SELECT l_returnflag,
        |ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50,
        |ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 4) AS p90,
        |ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS price_p25
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_bool" ->
      """SELECT event_type,
        |BOOL_AND(value > 0) AS all_positive,
        |BOOL_OR(value > 400) AS any_large,
        |COUNT(*) FILTER (value > 100) AS n_over_100,
        |MAX_BY(event_id, value * 1e9 + event_id) AS id_of_max,
        |MIN_BY(event_id, value * 1e9 - event_id) AS id_of_min
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_corr" ->
      """SELECT l_returnflag,
        |ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qp,
        |ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qp,
        |ROUND(VAR_SAMP(l_quantity), 4) AS var_q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "fn_hash" ->
      """SELECT c_custkey,
        |md5(c_name) AS name_md5,
        |sha256(c_name) AS name_sha256,
        |CAST(LENGTH(md5(c_name)) AS INT) AS md5_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "win_first_last" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS first_price,
        |CAST(LAST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS last_price,
        |NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "fn_cond" ->
      """SELECT o_orderkey,
        |CASE WHEN o_totalprice > 300000 THEN 'big'
        |     WHEN o_totalprice > 100000 THEN 'mid'
        |     ELSE 'small' END AS size_class,
        |NULLIF(o_orderstatus, 'O') AS non_open_status,
        |COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        |CAST(LEAST(CAST(o_totalprice AS DECIMAL(18,2)), CAST(150000 AS DECIMAL(18,2))) AS DOUBLE) AS capped,
        |CAST(GREATEST(CAST(o_totalprice AS DECIMAL(18,2)), CAST(1000 AS DECIMAL(18,2))) AS DOUBLE) AS floored
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_bitwise" ->
      """SELECT p_partkey,
        |CAST(p_size & 12 AS INT) AS band,
        |CAST(p_size | 5 AS INT) AS bor,
        |CAST(xor(p_size, 21) AS INT) AS bxor,
        |CAST(p_size << 2 AS INT) AS shl,
        |CAST(p_size >> 1 AS INT) AS shr,
        |CAST(bit_count(p_size) AS INT) AS popcnt
        |FROM part ORDER BY p_partkey""".stripMargin,

    "join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "sql_subquery" ->
      """SELECT c_custkey, c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "sql_cte" ->
      """WITH seg AS (
        |  SELECT c_custkey, c_mktsegment FROM customer),
        |big AS (
        |  SELECT o_custkey, COUNT(*) AS n FROM orders
        |  WHERE o_totalprice > 200000 GROUP BY o_custkey)
        |SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS n_big,
        |       COUNT(*) AS n_cust
        |FROM seg JOIN big ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "dedup_ngram" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, substring(lower(text), i, 4) s
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(1, length(text) - 3)) i
        |        FROM documents WHERE doc_id < 500 AND length(text) >= 4)),
        |sizes AS (SELECT doc_id, COUNT(*) n FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id d1, b.doc_id d2, COUNT(*) i
        |  FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, jac FROM (
        |  SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) jac
        |  FROM inter JOIN sizes s1 ON d1 = s1.doc_id
        |             JOIN sizes s2 ON d2 = s2.doc_id)
        |WHERE jac >= 0.6 ORDER BY d1, d2""".stripMargin,

    "fn_string2" ->
      """SELECT p_partkey,
        |CAST(levenshtein(p_name, 'small ring') AS INT) AS lev,
        |split_part(p_name, ' ', 1) AS first_part,
        |CAST(instr(p_name, 'ring') AS INT) AS pos_ring,
        |repeat(p_brand, 2) AS brand2x,
        |reverse(p_name) AS rev,
        |translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        |regexp_matches(p_name, 'ring|bolt') AS has_ring_bolt,
        |CAST(len(regexp_extract_all(p_name, '[aeiou]+', 0)) AS INT) AS vowel_runs
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_array2" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents)
        |SELECT doc_id,
        |to_json(list_sort(list_distinct(toks))) AS vocab,
        |CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |list_contains(toks, 'the') AS has_the,
        |to_json(flatten([toks[1:2], toks[3:4]])) AS head4,
        |list_max(list_sort(list_distinct(toks))) AS max_tok,
        |list_min(list_sort(list_distinct(toks))) AS min_tok
        |FROM t ORDER BY doc_id""".stripMargin,

    "agg_collect" ->
      """SELECT event_type,
        |CAST(len(list_sort(list(DISTINCT user_id))) AS INT) AS n_users,
        |to_json(list_sort(list(DISTINCT user_id))[1:20]) AS first_users,
        |to_json(list_sort(list(user_id))[1:5]) AS first_ids
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "pivot_long" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    "text_ngram" ->
      """SELECT gram, COUNT(*) AS n FROM (
        |  SELECT substring(lower(text), i, 3) AS gram
        |  FROM (SELECT text, unnest(generate_series(1, length(text) - 2)) i
        |        FROM documents WHERE length(text) >= 3))
        |GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 20""".stripMargin
  )
}
