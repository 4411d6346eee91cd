package graft

import graft.functions.TopKSketch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving heavy-hitters ([[TopKSketch]]): exact in the
  * capacity ≥ distinct regime (any partitioning), bounded-overestimate
  * and head-preserving in the lossy regime.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** sketch over `items` at `capacity`/`partitions` → item → (count, err) */
  private def sketch(items: Seq[String], capacity: Int,
                     partitions: Int): Map[String, (Long, Long)] = {
    import spark.implicits._
    TopKSketch.register(spark, capacity)
    items.toDF("item").repartition(partitions)
      .agg(call_function("topk_sketch", col("item")).as("sk"))
      .select(explode(col("sk")).as(Seq("item", "ce")))
      .collect()
      .map(r => r.getString(0) -> (r.getSeq[Long](1)(0), r.getSeq[Long](1)(1)))
      .toMap
  }

  // True heavy hitters: SpaceSaving's eviction floor is N/capacity
  // (~1125 here at capacity 8), so only items far above that are
  // GUARANTEED to survive — make the head unambiguous: 5000/2000 heads
  // over a 50×20 tail (N = 9000).
  private val skewed: Seq[String] =
    Seq.fill(5000)("item_00") ++ Seq.fill(2000)("item_01") ++
      (0 until 50).flatMap(i => Seq.fill(20)(f"tail_$i%02d"))
  private val truth: Map[String, Long] =
    skewed.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("capacity >= distinct: exact counts, zero error, any partitioning") {
    for (parts <- Seq(1, 4)) {
      val got = sketch(scala.util.Random.shuffle(skewed), capacity = 64,
        partitions = parts) // 52 distinct < 64
      assert(got.view.mapValues(_._1).toMap === truth)
      assert(got.values.forall(_._2 == 0L), "exact regime must carry zero error")
    }
  }

  test("lossy regime: overestimate bound holds and the head survives") {
    val got = sketch(scala.util.Random.shuffle(skewed), capacity = 8,
      partitions = 4)
    assert(got.size <= 8)
    // SpaceSaving guarantee: true <= est <= true + err
    got.foreach { case (item, (est, err)) =>
      val t = truth.getOrElse(item, 0L)
      assert(est >= t, s"$item underestimated: $est < $t")
      assert(est - err <= t, s"$item bound violated: $est - $err > $t")
    }
    // heads far above the N/capacity eviction floor must be present
    Seq("item_00", "item_01").foreach { item =>
      assert(got.contains(item), s"head item $item evicted")
      val (est, err) = got(item)
      assert(est - truth(item) <= err)
    }
  }

  test("a literal capacity argument is honored, junk arities fail loudly") {
    import spark.implicits._
    TopKSketch.register(spark)
    Seq("a", "a", "b", "c", "d", "e").toDF("item")
      .createOrReplaceTempView("cap_items")
    val n = spark.sql("SELECT topk_sketch(item, 2) AS sk FROM cap_items")
      .select(explode(col("sk"))).count()
    assert(n === 2, "capacity literal ignored")
    intercept[Exception] {
      spark.sql("SELECT topk_sketch(item, 2, 3) FROM cap_items").collect()
    }
  }

  test("text_topk_tokens oracle query runs and ranks the fixture head") {
    val out = SparkEntry.queries("text_topk_tokens")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 20)
    assert(out.map(_.getLong(1)).toSeq == out.map(_.getLong(1)).toSeq.sorted.reverse,
      "counts must be descending")
  }
}
