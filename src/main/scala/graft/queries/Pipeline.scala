package graft.queries

import graft.{Oracle, Tables}
import graft.operators.{Merge, Packing, Profile, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-maintenance and manifest operators of a training-data
  * pipeline: CDC merge, exact-quota sampling, sequence packing. All
  * three are oracle-checked — the operators are window/union shapes
  * whose semantics DuckDB can replay exactly.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- CDC merge: upserts + versioned conflicts + tombstones ----------
    // A deterministic changeset synthesized from orders itself: keys
    // %7 get an update (v1), keys %14 a NEWER update (v2, must win),
    // keys %13 a tombstone (v3, beats both updates on %91 overlaps),
    // keys %97 an insert under a fresh key. One hash shuffle on the
    // merge key (union + window), not an anti-join + union — see
    // operators.Merge. Output: next-snapshot counts/totals per status.
    "merge_upsert" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val upd1 = o.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("_v", lit(1L)).withColumn("_op", lit("U"))
      val upd2 = o.filter(col("o_orderkey") % 14 === 0)
        .withColumn("o_orderstatus", lit("V"))
        .withColumn("o_totalprice", col("o_totalprice") + 2000)
        .withColumn("_v", lit(2L)).withColumn("_op", lit("U"))
      val dels = o.filter(col("o_orderkey") % 13 === 0)
        .withColumn("_v", lit(3L)).withColumn("_op", lit("D"))
      val ins = o.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("_v", lit(1L)).withColumn("_op", lit("U"))
      val changes = upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
      Merge.applyCdc(o, changes, Seq("o_orderkey"), col("_v"), "_op", "D")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          Oracle.out(sum(Oracle.dec(col("o_totalprice")))).as("total"))
        .orderBy(col("o_orderstatus"))
    },

    // -- exact-k per-stratum sample (eval carving / language quotas) ----
    // md5-ranked so the SAME 20 docs come out in any engine, on any
    // cluster, at any partitioning.
    "sample_stratified_k" -> { (s, dir) =>
      Sampling.stratifiedK(Tables(s, dir, "documents"),
          Seq(col("lang")), col("doc_id"), k = 20)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    },

    // -- sequence packing manifest --------------------------------------
    // Documents stream per (lang, shard) in doc_id order; each doc joins
    // the pack its first token falls into (budget 500). The shard key is
    // the scale lever: parallelism = #langs × #shards regardless of
    // corpus size. Output: the pack manifest (docs + token sum per pack).
    "text_pack" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          (col("doc_id") % 4).as("shard"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
      Packing.packBySize(docs, col("n_toks"),
          Seq(col("lang"), col("shard")), Seq(col("doc_id")), budget = 500L)
        .groupBy(col("lang"), col("shard"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("pack_toks"))
        .orderBy(col("lang"), col("shard"), col("pack_id"))
    },

    // -- per-column profile audit ---------------------------------------
    // Exact mode here because the oracle replays COUNT(DISTINCT); the
    // operator defaults to approx_count_distinct (no Expand) at scale.
    "profile_table" -> { (s, dir) =>
      Profile.profile(Tables(s, dir, "documents"), exact = true)
        .orderBy(col("col_name"))
    }
  )

  val oracle: Map[String, String] = Map(
    "merge_upsert" ->
      """WITH ch AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000 AS o_totalprice,
        |         1 AS v, 'U' AS op
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'V', o_totalprice + 2000, 2, 'U'
        |  FROM orders WHERE o_orderkey % 14 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 3, 'D'
        |  FROM orders WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice, 1, 'U'
        |  FROM orders WHERE o_orderkey % 97 = 0
        |), unioned AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |         0 AS is_change, NULL::BIGINT AS ver, false AS del
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, 1, v, op = 'D' FROM ch
        |), merged AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |    ORDER BY is_change DESC, ver DESC NULLS LAST) AS rn
        |  FROM unioned
        |)
        |SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM merged WHERE rn = 1 AND NOT del
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "sample_stratified_k" ->
      """SELECT lang, rk, doc_id FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,

    "text_pack" ->
      """WITH sized AS (
        |  SELECT doc_id, lang, doc_id % 4 AS shard,
        |    len(string_split(text, ' '))::BIGINT AS n_toks
        |  FROM documents
        |), packed AS (
        |  SELECT lang, shard, n_toks,
        |    COALESCE(SUM(n_toks) OVER (PARTITION BY lang, shard
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS start_tok
        |  FROM sized
        |)
        |SELECT lang, shard, CAST(FLOOR(start_tok / 500) AS BIGINT) AS pack_id,
        |  COUNT(*) AS n_docs, SUM(n_toks)::BIGINT AS pack_toks
        |FROM packed GROUP BY lang, shard, pack_id
        |ORDER BY lang, shard, pack_id""".stripMargin,

    "profile_table" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_nulls,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  MIN(CAST($c AS VARCHAR)) AS v_min,
           |  MAX(CAST($c AS VARCHAR)) AS v_max
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }
  )
}
