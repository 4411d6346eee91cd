package graft

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-identity gate for the [[graft.functions.DotProduct]] +
  * precomputed-norm scoring path that [[graft.operators.EmbedDedup]]
  * uses within cells: `dot/(nrm1·nrm2)` with nrm = sqrt of the same
  * left-to-right square fold must equal [[CosineSimilarity]]'s fused
  * result to the last bit (IEEE sqrt/multiply/divide are exact functions
  * of their operands; the accumulation orders match element-for-element).
  */
class DotProductSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dot/(nrm*nrm) is bit-identical to fused cosine on real embeddings") {
    DotProduct.register(spark)
    CosineSimilarity.register(spark)
    val vecs = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          (x: org.apache.spark.sql.Column) => x.cast("double")).as("e"))
      .withColumn("nrm",
        sqrt(aggregate(col("e"), lit(0.0d), (acc, x) => acc + x * x)))
      .limit(60)
    val pairs = vecs.alias("a").crossJoin(vecs.alias("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        (DotProduct(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")))
          .as("via_dot"),
        CosineSimilarity(col("a.e"), col("b.e")).as("via_fused"))
      .collect()
    assert(pairs.length > 1000)
    pairs.foreach { r =>
      val d = java.lang.Double.doubleToLongBits(r.getDouble(0))
      val c = java.lang.Double.doubleToLongBits(r.getDouble(1))
      assert(d == c, s"bit mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("dot_product matches SQL-expressible fold and handles nulls") {
    DotProduct.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -0.25), Array(-2.0, 8.0)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val got = df.select(DotProduct(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(32.0, -3.0, 0.0))
    // null array -> null result (BinaryExpression null intolerance)
    val n = df.select(DotProduct(lit(null).cast("array<double>"), col("b")))
      .collect()
    assert(n.forall(_.isNullAt(0)))
    // shorter array bounds the fold (CosineSimilarity / DuckDB
    // list_inner_product length parity)
    val s = Seq((Array(1.0, 2.0, 9.0), Array(3.0, 4.0)))
      .toDF("a", "b")
      .select(DotProduct(col("a"), col("b"))).collect()
    assert(s.head.getDouble(0) === 11.0)
  }
}
