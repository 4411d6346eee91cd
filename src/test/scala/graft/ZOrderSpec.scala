package graft

import graft.operators.{Layout, ZOrder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering ([[ZOrder]]): interleave correctness against a
  * plain-Scala reference, and the layout property that justifies the
  * operator — z-clustering tightens per-partition ranges of EVERY
  * interleaved dimension, where single-column clustering leaves the
  * other dimension at full width.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def refInterleave(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; (x, i) <- xs.zipWithIndex)
      if (((x >> b) & 1L) == 1L) z |= 1L << (b * xs.size + i)
    z
  }

  test("zvalue matches the reference bit interleave") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 1L),
      (65535L, 65535L), (12345L, 54321L))
    val got = rows.toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (x, y) => refInterleave(Seq(x, y), 16) }
    assert(got === want)
  }

  test("normalize clamps into [0, 2^bits)") {
    import spark.implicits._
    val got = Seq(-5.0, 0.0, 50.0, 100.0, 200.0).toDF("v")
      .select(ZOrder.normalize(col("v"), 0.0, 100.0, 8).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got.head === 0L)       // below lo clamps
    assert(got.last === 255L)     // above hi clamps
    assert(got(2) === 127L)       // midpoint
    assert(got.forall(n => n >= 0 && n <= 255))
  }

  test("z-clustering tightens BOTH dimensions' per-partition spans") {
    import spark.implicits._
    // a uniform 2-D grid: 256 × 256 points
    val pts = spark.range(0, 65536).select(
      (col("id") % 256).cast("double").as("x"),
      (col("id") / 256).cast("double").as("y"))
    val dims = Seq((col("x"), 0.0, 256.0), (col("y"), 0.0, 256.0))

    def meanSpan(df: org.apache.spark.sql.DataFrame, c: String): Double =
      df.withColumn("p", spark_partition_id())
        .groupBy(col("p")).agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg(col("span"))).head.getDouble(0)

    val zClustered = ZOrder.cluster(pts, dims, numPartitions = 16, bits = 8)
    val xClustered = pts.repartitionByRange(16, col("x"))

    // 16 partitions over 8-bit z = 2 bits per dim per partition prefix:
    // each partition covers ~1/4 of each dimension's width
    assert(meanSpan(zClustered, "x") < 0.5 * 256,
      "z-clustering left x nearly full-width")
    assert(meanSpan(zClustered, "y") < 0.5 * 256,
      "z-clustering left y nearly full-width")
    // single-column clustering: x tight, y stays full-width
    assert(meanSpan(xClustered, "x") < 0.2 * 256)
    assert(meanSpan(xClustered, "y") > 0.9 * 256,
      "baseline should leave y unclustered — did the fixture change?")
  }

  test("compaction rewrites many small files into the planned few, rows intact") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val in = s"$base/in"
    val out = s"$base/out"
    // 32 small files
    (0L until 20000L).map(i => (i, s"row-$i")).toDF("id", "s")
      .repartition(32).write.parquet(in)
    def dataFiles(dir: String) =
      new java.io.File(dir).listFiles().filter(f =>
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(dataFiles(in).length === 32)

    val bytes = Layout.dataBytes(spark, in)
    assert(bytes === dataFiles(in).map(_.length).sum)
    // target = ~1/4 of the input → 4 planned files
    val (planned, _) = Layout.compact(spark, in, out, targetFileBytes = (bytes + 3) / 4)
    assert(planned === 4)
    assert(dataFiles(out).length === 4)
    assert(spark.read.parquet(out).count() === 20000L)

    // sorted compaction: disjoint per-file id ranges (min/max skipping)
    val outSorted = s"$base/out_sorted"
    Layout.compact(spark, in, outSorted, (bytes + 3) / 4, orderBy = Seq(col("id")))
    val ranges = dataFiles(outSorted).map { f =>
      val df = spark.read.parquet(f.getAbsolutePath)
      val r = df.agg(min(col("id")), max(col("id"))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: ${ranges.toSeq}")
      case _ =>
    }
    assert(spark.read.parquet(outSorted).count() === 20000L)
  }

  test("compact rejects input==output under any path spelling") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-layout-guard")
    val in = base.resolve("in").toString
    (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").write.parquet(in)
    // absolute vs file:-qualified vs relative spellings of the SAME dir
    // must all trip the guard — a URI-string compare lets them through
    val spellings = Seq(
      in,
      "file:" + in,
      java.nio.file.Paths.get("").toAbsolutePath.relativize(base).resolve("in").toString)
    for (alias <- spellings) {
      val e = intercept[IllegalArgumentException] {
        Layout.compact(spark, in, alias, targetFileBytes = 1L << 20)
      }
      assert(e.getMessage.contains("must not equal or nest"), s"spelling: $alias")
    }
    // nesting still caught after qualification
    intercept[IllegalArgumentException] {
      Layout.compact(spark, in, s"$in/sub", targetFileBytes = 1L << 20)
    }
    (): Unit
  }
}
