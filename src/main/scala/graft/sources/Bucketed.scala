package graft.sources

import java.nio.file.{Files, Path, Paths}

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed materialisations of the fixture fact tables.
  *
  * Bucketing is THE mechanism for repeated co-located fact-fact joins at
  * scale: both sides are written pre-hashed (Murmur3, `pmod` bucket count)
  * and pre-sorted on the join key, so every later join on that key is a
  * zero-exchange sort-merge — the shuffle is paid once at layout time, not
  * per query. On a 1000-executor cluster this converts the dominant
  * repeated cost (re-shuffling a 100 TB lineitem for every orderkey join)
  * into a one-time write.
  *
  * Mechanics here (single-JVM local mode, same layout rules as a cluster):
  *  - tables are EXTERNAL (explicit `path`), so the parquet + bucket file
  *    names survive the JVM; the in-memory catalog forgets the metadata,
  *    so later JVMs re-register the existing files with `CREATE TABLE …
  *    CLUSTERED BY` instead of rewriting them (schema DDL is persisted in
  *    the ready-marker at write time);
  *  - the frame is `repartition(buckets, key)` before the bucketed write:
  *    repartition and bucketing use the same Murmur3-pmod function, so
  *    each task holds exactly one bucket → ONE file per bucket → Spark
  *    elides the merge-join sort (files are `sortBy`-sorted);
  *  - only the columns a query needs are materialised — bucketed layout
  *    is a projection-and-layout decision, not a table copy.
  */
object Bucketed {
  /** Bucket count: 16 spreads sf0.1 nicely over local[32]; on a real
    * cluster this is sized to executors × a small factor (e.g. 4096).
    */
  val NumBuckets = 16

  /** Layout signature: the table identity covers EVERYTHING that defines
    * the physical files — source dir, table, bucket key, bucket count,
    * and the projected column list — so a call site with a different
    * projection or key can never be handed another call site's layout.
    */
  private def sfx(sfDir: String, name: String, key: String,
      cols: Seq[String]): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|$name|$key|$NumBuckets|${cols.mkString(",")}"
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    s"${name}_${h.take(8)}"
  }

  /** Marker inside the data dir recording a completed write: bucket key,
    * bucket count, and schema DDL (underscore prefix: parquet readers
    * skip it like `_SUCCESS`). Re-registration trusts the files only if
    * ALL three match — files bucketed on an old key/count re-registered
    * under new metadata would elide exchanges the data doesn't satisfy
    * and return silently wrong joins.
    */
  private def marker(dir: Path): Path = dir.resolve("_GRAFT_BUCKETS_READY")

  private def markerContent(key: String, ddl: String): String =
    s"$key\n$NumBuckets\n$ddl"

  private def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      // Files.walk holds an open directory handle until closed — leak-
      // free via try/finally (a long-lived JVM churning layouts would
      // otherwise exhaust fds).
      val walk = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      } finally walk.close()
    }

  /** Delete sibling `graft-buckets-*` dirs whose marker is absent or in
    * a superseded format (not `key\nbuckets\nddl`) — failed writes and
    * layouts from older library versions, which no current signature
    * will ever re-read.
    */
  /** Minimum age before an unmarked sibling layout is considered garbage.
    * The marker is written only AFTER saveAsTable completes, so a fresh
    * unmarked dir may be another process mid-write — deleting it would
    * yank the layout out from under that writer. An hour-old unmarked dir
    * is a crashed write (the single-layout writes here take seconds), and
    * sweeping only those keeps the blast radius to provable orphans.
    */
  private val SweepAgeMs = 60L * 60 * 1000

  /** Newest mtime anywhere under `dir`: a layout mid-write keeps its
    * task files churning under `_temporary/...` without ever touching
    * the TOP-LEVEL dir's mtime, so the age gate must look at the whole
    * subtree or a >1h write would still be reaped mid-flight. Bucket
    * layouts hold at most a few hundred entries — the walk is cheap.
    */
  private def newestMtime(dir: Path): Long = {
    // The walk races the very writers the age gate protects: a sibling
    // process can rename/delete task files between listing and stat. Any
    // IO failure reads as "fresh" (Long.MaxValue) — sparing a dir we
    // couldn't inspect is always safe; best-effort cleanup must never
    // abort the caller's query.
    try {
      val walk = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .map(p => Files.getLastModifiedTime(p).toMillis)
          .foldLeft(0L)(math.max)
      } finally walk.close()
    } catch { case _: Exception => Long.MaxValue }
  }

  private def sweepStaleLayouts(tmp: Path): Unit = {
    val ls = Files.list(tmp)
    try {
      import scala.jdk.CollectionConverters._
      val cutoff = System.currentTimeMillis() - SweepAgeMs
      ls.iterator().asScala
        .filter(d => d.getFileName.toString.startsWith("graft-buckets-") &&
          Files.isDirectory(d))
        .filter { d =>
          val m = marker(d)
          (!Files.exists(m) || Files.readString(m).linesIterator.size < 3) &&
            newestMtime(d) < cutoff
        }
        .foreach(deleteRecursively)
    } finally ls.close()
  }

  /** A bucketed, key-sorted, column-pruned copy of fixture table `name`,
    * created on first use per (JVM, sfDir) and re-registered from existing
    * files in later JVMs.
    *
    * Single-writer assumption: the `synchronized` guard serialises threads
    * WITHIN a JVM; two separate processes bootstrapping the same layout
    * concurrently would race on the overwrite. That is the deployment
    * model here (the driver serialises its sbt invocations) and the
    * production model in general — layout materialisation is a scheduled
    * job, not an implicit side effect of two readers.
    */
  def table(spark: SparkSession, sfDir: String, name: String, key: String,
      cols: Seq[String]): DataFrame = synchronized {
    val id = sfx(sfDir, name, key, cols)
    val tbl = s"graft_bkt_$id"
    if (!spark.catalog.tableExists(tbl)) {
      val dir = Paths.get(sys.props("java.io.tmpdir"), s"graft-buckets-$id")
      val wanted = Tables(spark, sfDir, name)
        .select(cols.map(col).toIndexedSeq: _*)
      // A marker from a previous JVM re-registers the existing files —
      // but only if it was written for the SAME key, bucket count, and
      // projection; a stale marker (layout parameters changed between
      // library versions) forces a rewrite. (The fixture itself is
      // immutable by contract — TESTDATA.md — so data staleness under an
      // unchanged signature is out of scope.)
      if (Files.exists(marker(dir)) &&
          Files.readString(marker(dir)).trim ==
            markerContent(key, wanted.schema.toDDL)) {
        spark.sql(
          s"""CREATE TABLE $tbl (${wanted.schema.toDDL}) USING PARQUET
             |CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS
             |LOCATION '${dir.toUri}'""".stripMargin)
      } else {
        // The rewrite is a CREATE TABLE AS SELECT with an explicit
        // location (the table is absent from this catalog), and Spark
        // rejects CTAS into a NON-EMPTY location — clear any stale or
        // partial files first. Also sweep sibling layouts whose marker
        // predates the current format (dirs named by a superseded
        // signature scheme are otherwise orphaned forever — fact-table-
        // sized parquet accumulating in tmpdir).
        deleteRecursively(dir)
        sweepStaleLayouts(dir.getParent)
        val df = wanted.repartition(NumBuckets, col(key))
        df.write.mode("overwrite")
          .bucketBy(NumBuckets, key).sortBy(key)
          .option("path", dir.toString)
          .saveAsTable(tbl)
        Files.writeString(marker(dir),
          markerContent(key, df.schema.toDDL))
      }
    }
    spark.table(tbl)
  }
}
