package graft

import graft.operators.Salt
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hot-key scenarios for the two skew mitigations the library leans on
  * (PERF.md "Deliberate physical choices"):
  *
  *  1. **AQE skew-join**: a deliberately skewed build of one hot key must
  *     make AQE split the oversized partition at runtime — asserted on
  *     the FINAL adaptive plan (`skew=true` on the sort-merge join), not
  *     on timing (this VM's ±30% noise would make a timing assertion
  *     flaky and prove nothing about the mechanism).
  *  2. **Deterministic salting** ([[Salt.saltedEquiJoin]]): the hot key's
  *     reducer load divides by the salt factor — asserted by comparing
  *     max group size keyed by (k) vs (k, salt) — while the join result
  *     stays EXACTLY the plain join's.
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val HotRows = 300000L
  private val ColdRows = 100000L

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** 400k rows, 75% on key 0, the rest uniform over 1..1000, ~60-byte
    * payload so partition byte sizes are meaningful to AQE.
    */
  private def skewedLeft = {
    import spark.implicits._
    spark.range(0, HotRows + ColdRows).select(
      when($"id" < HotRows, 0L).otherwise($"id" % 1000 + 1).as("k"),
      lpad($"id".cast("string"), 48, "x").as("payload"))
  }

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    import spark.implicits._
    // save/restore EVERY conf this test sets — leaked AQE thresholds
    // would silently change partition coalescing for later tests in the
    // shared session
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      // force a shuffle join: broadcasting the dim would hide the skew
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val rightDf = spark.range(0, 1001).toDF("k")
      val joined = skewedLeft.join(rightDf, "k")
      // execute THIS QueryExecution (count() would plan a separate one
      // and leave joined's adaptive plan unexecuted)
      assert(joined.collect().length === HotRows + ColdRows)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join; final plan:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salting divides the hot key's reducer load by the salt factor") {
    val factor = 8
    val salted = skewedLeft.withColumn("_salt",
      pmod(xxhash64(col("payload")), lit(factor.toLong)))
    val hotPlain = skewedLeft.groupBy(col("k"))
      .count().agg(max("count")).head.getLong(0)
    val hotSalted = salted.groupBy(col("k"), col("_salt"))
      .count().agg(max("count")).head.getLong(0)
    assert(hotPlain === HotRows)
    // hash-uniform split: each sub-key gets ~HotRows/factor (±25%)
    assert(hotSalted < HotRows / factor * 1.25,
      s"salt failed to spread the hot key: max sub-group $hotSalted")
  }

  test("salted join on the skewed build equals the plain join exactly") {
    import spark.implicits._
    val right = spark.range(0, 1001).toDF("k")
      .withColumn("dim", concat(lit("dim-"), col("k")))
    val plain = skewedLeft.join(right, "k")
    val salted = Salt.saltedEquiJoin(
      skewedLeft, right.withColumnRenamed("k", "rk"),
      "k", "rk", saltOn = col("payload"), factor = 8)
      .drop("rk")
    assert(salted.count() === plain.count())
    // column order may differ; compare as sorted tuples
    val a = plain.select($"k", $"payload", $"dim").orderBy($"k", $"payload")
    val b = salted.select($"k", $"payload", $"dim").orderBy($"k", $"payload")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
