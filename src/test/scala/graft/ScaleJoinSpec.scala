package graft

import java.nio.file.Files

import graft.operators.{AsOfJoin, Salt}
import graft.sources.Formats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path join machinery and file-format surface: each alternative
  * implementation must produce EXACTLY the baseline's rows, and the
  * bucketed join must show a shuffle-free plan.
  */
class ScaleJoinSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sort-merge as-of join equals the window-based join_asof query") {
    val events = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    // The parquet o_orderdate is TIMESTAMP_NTZ (timestamp[ms], not
    // UTC-adjusted); the typed encoder yields TimestampType — cast for a
    // type-identical comparison (values are UTC-naive on both paths).
    val merge = AsOfJoin.eventsAsOfOrders(events, orders).toDF()
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val window = SparkEntry.queries("join_asof")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(merge.size == window.size)
    assert(merge == window)
  }

  test("salted join returns exactly the plain join's rows") {
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity", "l_linenumber")
    val o = Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .orderBy("l_orderkey").collect().map(_.toSeq).toSeq
    val salted = Salt.saltedEquiJoin(li, o, "l_orderkey", "o_orderkey",
        saltOn = col("l_orderkey") * 10000 + col("l_linenumber"), factor = 8)
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .orderBy("l_orderkey").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // The suite may inherit another spec's session (getOrCreate), whose
    // warehouse can hold orphaned locations from a previous JVM — clear
    // both the catalog entries and the physical dirs.
    for (t <- Seq("orders_bucketed", "customer_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    val o = Tables(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables(spark, sf, "customer").select("c_custkey", "c_name")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bucketed")
    val joined = spark.sql(
      """SELECT /*+ MERGE(o) */ c_custkey, count(*) AS n
        |FROM orders_bucketed o JOIN customer_bucketed c
        |  ON o.o_custkey = c.c_custkey
        |GROUP BY c_custkey""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }

  test("join_bucketed never re-partitions the join key (registered query)") {
    // Forcing SMJ makes the gate meaningful at any scale: without the
    // bucketed layout the join would demand a hashpartitioning exchange
    // on each side's orderkey; with it, the only exchanges left belong to
    // the 5-group roll-up and the final order.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("join_bucketed")(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("hashpartitioning(o_orderkey") &&
        !plan.contains("hashpartitioning(l_orderkey"),
        s"bucketed fact join re-shuffled its key:\n$plan")
      // Sort elision: Spark 3+ ignores write-time `sortBy` order at scan
      // time by DEFAULT (SPARK-28632 — a bucket with >1 file would be
      // only per-file sorted), so the default plan carries a cheap
      // partition-local Sort and NO exchange. Our writer guarantees one
      // file per bucket (repartition on the bucket hash before write);
      // under the legacy outputOrdering flag that lets Spark trust the
      // file order, the merge-join sorts disappear entirely.
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val ordered = SparkEntry.queries("join_bucketed")(spark, sf)
      val oPlan = ordered.queryExecution.executedPlan.toString
      val joinSubtree = oPlan.substring(oPlan.indexOf("SortMergeJoin"))
      assert(!joinSubtree.contains("Sort [o_orderkey") &&
        !joinSubtree.contains("Sort [l_orderkey"),
        s"bucketed join re-sorted one-file-per-bucket sorted data:\n$oPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("Bucketed re-registers existing files in a fresh catalog (second JVM)") {
    import graft.sources.Bucketed
    val before = SparkEntry.queries("join_bucketed")(spark, sf)
      .collect().map(_.toSeq).toSeq
    // simulate the next JVM: catalog forgets the tables, files + marker stay
    for (t <- spark.catalog.listTables().collect().map(_.name)
         if t.startsWith("graft_bkt_"))
      spark.sql(s"DROP TABLE $t")
    val after = SparkEntry.queries("join_bucketed")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(after == before)
    // and the re-registered table is still bucketed metadata, not a plain scan
    val o = Bucketed.table(spark, sf, "orders", "o_orderkey",
      Seq("o_orderkey", "o_orderpriority"))
    assert(o.queryExecution.optimizedPlan.toString.nonEmpty)
    val plan = {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = SparkEntry.queries("join_bucketed")(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        df.queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
    assert(plan.contains("Bucketed: true"), plan)
    assert(!plan.contains("hashpartitioning(o_orderkey") &&
      !plan.contains("hashpartitioning(l_orderkey"), plan)
  }

  test("Bucketed rewrites (not re-registers) when the marker is stale") {
    import java.nio.file.{Files, Paths}
    val before = SparkEntry.queries("join_bucketed")(spark, sf)
      .collect().map(_.toSeq).toSeq
    // find the lineitem layout dir via its marker and corrupt it: a
    // changed bucket key in the marker must force a rewrite, and the
    // rewrite must survive the non-empty CTAS location
    val tmp = Paths.get(sys.props("java.io.tmpdir"))
    val dirs = Files.list(tmp).iterator()
    var corrupted = 0
    dirs.forEachRemaining { d =>
      val m = d.resolve("_GRAFT_BUCKETS_READY")
      if (d.getFileName.toString.startsWith("graft-buckets-lineitem_") &&
          Files.exists(m)) {
        Files.writeString(m, Files.readString(m).replaceFirst("^l_orderkey", "l_partkey"))
        corrupted += 1
      }
    }
    assert(corrupted > 0, "no lineitem bucket marker found to corrupt")
    for (t <- spark.catalog.listTables().collect().map(_.name)
         if t.startsWith("graft_bkt_lineitem"))
      spark.sql(s"DROP TABLE $t")
    val after = SparkEntry.queries("join_bucketed")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(after == before)
  }

  test("Bucketed stale-layout sweep spares fresh unmarked dirs (in-flight writers)") {
    import java.nio.file.{Files, Paths}
    // a FRESH unmarked sibling looks exactly like another process
    // mid-write (the marker lands only after saveAsTable finishes); the
    // sweep must only reap unmarked dirs whose whole SUBTREE is past the
    // age threshold (a long write churns task files while the top-level
    // dir's mtime stays stale)
    val tmp = Paths.get(sys.props("java.io.tmpdir"))
    val fresh = tmp.resolve("graft-buckets-inflight_test")
    Files.createDirectories(fresh)
    val partial = fresh.resolve("part-00000.parquet")
    Files.writeString(partial, "partial")
    // force the orders layout to rewrite (stale-marker branch), which
    // runs the sweep on the way — the shared trigger for both phases
    def triggerSweepViaOrdersRewrite(): Unit = {
      var corrupted = 0
      val ls = Files.list(tmp)
      try ls.iterator().forEachRemaining { d =>
        val m = d.resolve("_GRAFT_BUCKETS_READY")
        if (d.getFileName.toString.startsWith("graft-buckets-orders_") &&
            Files.exists(m)) {
          Files.writeString(m, Files.readString(m).replaceFirst("^o_orderkey", "o_custkey"))
          corrupted += 1
        }
      } finally ls.close()
      assert(corrupted > 0, "no orders bucket marker found to corrupt")
      for (t <- spark.catalog.listTables().collect().map(_.name)
           if t.startsWith("graft_bkt_orders"))
        spark.sql(s"DROP TABLE $t")
      SparkEntry.queries("join_bucketed")(spark, sf).write
        .format("noop").mode("overwrite").save()
    }
    try {
      triggerSweepViaOrdersRewrite()
      assert(Files.exists(partial),
        "sweep deleted a fresh unmarked layout — would race an in-flight writer")
      // age the dir but keep the task file fresh: still an in-flight
      // write (subtree mtime governs), must be spared
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 60 * 60 * 1000)
      Files.setLastModifiedTime(fresh, old)
      triggerSweepViaOrdersRewrite()
      assert(Files.exists(partial),
        "sweep keyed on the dir mtime alone — a >1h in-flight write would be reaped")
      // whole subtree old = a crashed write; must be reaped
      Files.setLastModifiedTime(partial, old)
      Files.setLastModifiedTime(fresh, old)
      triggerSweepViaOrdersRewrite()
      assert(!Files.exists(fresh), "aged unmarked layout was not swept")
    } finally {
      if (Files.exists(fresh)) {
        Files.deleteIfExists(partial)
        Files.deleteIfExists(fresh)
      }
    }
  }

  test("partitioned writes prune partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/orders_by_year"
    Tables(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1997)
    val scan = pruned.queryExecution.executedPlan.toString
    // Partition filter must reach the scan; 1997 is one of ~7 year dirs.
    assert(scan.contains("PartitionFilters: [isnotnull(o_year"),
      s"no partition filter in scan:\n$scan")
    val total = spark.read.parquet(dir).count()
    val got = pruned.count()
    assert(got > 0 && got < total)
    val expected = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(got == expected)
  }

  test("csv/json/orc/xml round-trip preserves data exactly") {
    val orig = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val want = orig.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    for (fmt <- Seq("orc", "csv", "json", "xml")) {
      val dir = Files.createTempDirectory(s"graft-$fmt").toString + "/t"
      Formats.write(orig, fmt, dir)
      val got = Formats.read(spark, fmt, dir, orig.schema)
        .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
      assert(got == want, s"$fmt round-trip diverged")
    }
  }
}
