package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** text_dsir semantics beyond the oracle hash: the importance weight
  * must actually SEPARATE the target domain (the whole point of the
  * published method — a score that hashed away the signal would still
  * hash-match its own oracle).
  */
class Extra8Spec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dsir =
    SparkEntry.queries("text_dsir")(spark, sf).cache()

  test("target-language docs score higher than every other language on average") {
    val means = dsir.groupBy(col("lang"))
      .agg(avg(col("dsir_logw")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = means("en")
    means.filterNot(_._1 == "en").foreach { case (lang, m) =>
      assert(en > m, s"en mean $en not above $lang mean $m — no target signal")
    }
  }

  test("every document appears exactly once; n_bigrams = tokens - 1") {
    assert(dsir.count() ===
      spark.read.parquet(s"$sf/documents.parquet").count())
    // spot-check the feature count against an independent tokenization
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        (size(filter(split(lower(col("text")), " "),
          (x: org.apache.spark.sql.Column) => x =!= "")) - 1).as("expect"))
    val got = dsir.filter(col("doc_id") < 20)
      .select(col("doc_id"), col("n_bigrams"))
    val joined = docs.join(got, "doc_id")
      .filter(col("expect") =!= col("n_bigrams"))
    assert(joined.count() === 0)
  }

  test("graph_linkpred: candidates are 2-hop NON-neighbors, ranks contiguous, scores in (0,1]") {
    val lp = SparkEntry.queries("graph_linkpred")(spark, sf).cache()
    assert(lp.count() > 0, "no predictions — vacuous")
    // rebuild the adjacency independently; no prediction may be an
    // existing edge (the whole point of link PREDICTION)
    val so = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk")).distinct()
    val e = so.alias("x")
      .join(so.alias("y"),
        col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("a"), col("y.sk").as("b")).distinct()
    val adj = e.select(col("a").as("seed"), col("b").as("cand"))
      .unionByName(e.select(col("b").as("seed"), col("a").as("cand")))
    assert(lp.join(adj, Seq("seed", "cand"), "left_semi").count() === 0,
      "a predicted link already exists in the graph")
    // scores are valid Jaccards and ranks descend with them
    assert(lp.filter(col("jac") <= 0 || col("jac") > 1).count() === 0)
    val badRank = lp.withColumn("prev",
        lag(col("jac"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("seed")).orderBy(col("rn"))))
      .filter(col("prev").isNotNull && col("prev") < col("jac"))
    assert(badRank.count() === 0, "rank order violates score order")
  }

  test("weights are finite and the selected flag matches the score sign") {
    val bad = dsir.filter(isnan(col("dsir_logw")) ||
      col("dsir_logw").isNull ||
      (col("selected") =!= (col("dsir_logw") > 0))).count()
    assert(bad === 0)
  }
}
