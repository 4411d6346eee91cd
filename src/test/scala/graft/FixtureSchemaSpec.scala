package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary (the round-9 lesson).
  *
  * The driver regenerates /root/testdata between rounds, and the physical
  * schema has already shifted once: events.ts went from parquet
  * TIMESTAMP(NANOS) — readable only as Long nanos under `nanosAsLong` —
  * to TIMESTAMP(MICROS), which silently broke every events-table query in
  * one verification run because the loader assumed one generation
  * ([[Tables.events]] now branches on the surfaced type).
  *
  * This spec pins the LOGICAL schema each query is written against, as
  * surfaced through [[Tables]] — the one loader every query and spec uses.
  * If a future regeneration drifts (renamed column, changed type, a new
  * physical timestamp encoding the loader doesn't normalize), this fails
  * in `sbt test` naming the table and the diff, instead of 23 queries
  * failing analysis inside the driver's verify run.
  */
class FixtureSchemaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** name -> expected (column, type) list, in any physical order. */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1))
    test(s"$table surfaces the pinned logical schema") {
      val got = Tables(spark, sf, table).schema
        .map(f => f.name -> f.dataType).toMap
      for ((name, tpe) <- cols) {
        assert(got.contains(name), s"$table is missing column $name (has ${got.keys.toSeq.sorted})")
        assert(got(name) == tpe, s"$table.$name is ${got(name)}, queries expect $tpe")
      }
    }

  // Timestamp columns are the columns that have ALREADY drifted once —
  // assert the normalized type, not the physical encoding.
  test("events surfaces µs TimestampType ts regardless of physical encoding") {
    val s = Tables.events(spark, sf).schema.map(f => f.name -> f.dataType).toMap
    assert(s("ts") == TimestampType,
      s"events.ts surfaced as ${s("ts")} — Tables.events must normalize every " +
        "fixture generation (Long nanos, TIMESTAMP_NTZ, ...) to TimestampType")
    for ((c, t) <- Seq("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
      assert(s(c) == t, s"events.$c is ${s(c)}, queries expect $t")
  }

  // ScaleUp output must surface IDENTICAL logical schemas to its source
  // through the same Tables loader — the decade tables (PERF.md) are only
  // comparable if the Nx dirs obey the exact contract the 1x dir does.
  // This bit the build twice (NOTES_r9): a fixture regeneration changed
  // the events encoding and stale /tmp/scaleNN dirs from the previous
  // generation silently mixed generations in the decade numbers. A tiny
  // factor-2 replication of sf0.001 exercises the REAL generator.
  test("ScaleUp output surfaces the same logical schema as its source") {
    val out = java.nio.file.Files.createTempDirectory("graft_scaleup_canary")
      .toString
    try {
      ScaleUp.run(spark, sf, out, 2)
      val tables = expected.keys.toSeq ++ Seq("orders", "lineitem")
      for (t <- tables.sorted) {
        val src = Tables(spark, sf, t).schema.map(f => f.name -> f.dataType)
        val got = Tables(spark, out, t).schema.map(f => f.name -> f.dataType)
        assert(got == src,
          s"ScaleUp drifted $t: source surfaces $src, output surfaces $got")
      }
      val ev = Tables.events(spark, out).schema.map(f => f.name -> f.dataType).toMap
      assert(ev("ts") == TimestampType,
        s"ScaleUp events.ts surfaced as ${ev("ts")} through Tables.events")
      // replication sanity: row counts doubled for a replicated table
      assert(Tables(spark, out, "documents").count() ==
        2 * Tables(spark, sf, "documents").count())
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(out))
    }
  }

  test("orders/lineitem date columns surface as a datetime type") {
    val o = Tables(spark, sf, "orders").schema.map(f => f.name -> f.dataType).toMap
    val l = Tables(spark, sf, "lineitem").schema.map(f => f.name -> f.dataType).toMap
    for ((tbl, m, c) <- Seq(("orders", o, "o_orderdate"), ("lineitem", l, "l_shipdate")))
      assert(m(c) == TimestampType || m(c) == TimestampNTZType || m(c) == DateType,
        s"$tbl.$c is ${m(c)} — date comparisons in the TPC-H queries would break")
    for ((c, t) <- Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_totalprice" -> DoubleType))
      assert(o(c) == t, s"orders.$c is ${o(c)}, queries expect $t")
    for ((c, t) <- Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType))
      assert(l(c) == t, s"lineitem.$c is ${l(c)}, queries expect $t")
  }
}
