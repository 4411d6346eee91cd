package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** File-layout maintenance — the compaction half of the layout family
  * ([[ZOrder]] is the clustering half): rewrite a directory of many
  * small parquet files into approximately target-sized ones.
  *
  * Small files are the silent scale killer of long-running ingestion:
  * every micro-batch/task writes its own file, listings and footers
  * start to dominate scan time, and scheduling overhead swamps I/O. A
  * compaction pass sizes the output from the INPUT's compressed bytes —
  * output compression is assumed comparable (same format, same data;
  * the standard estimator) — and rewrites in one job.
  *
  * `orderBy` optionally sort-clusters while rewriting (pair with
  * [[ZOrder.zvalue]] for multi-dimensional clustering): compaction is
  * the natural moment to establish order, since the data is being
  * rewritten anyway. Without it the rewrite is a pure coalesce — no
  * shuffle, each output file stitches whole input files.
  */
object Layout {

  /** Total bytes of data files under `dir` (dot/underscore-prefixed
    * bookkeeping files excluded).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Files needed to land `totalBytes` at ~`targetFileBytes` apiece. */
  def plannedFiles(totalBytes: Long, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"target file size must be positive")
    math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
  }

  /** Rewrite `inDir` (parquet) into `outDir` as ~target-sized files.
    * Returns (files planned, input bytes). Unsorted: `coalesce` (no
    * shuffle); sorted: `repartitionByRange` on the keys, which both
    * sizes the files AND gives each one a disjoint key range (per-file
    * min/max skipping works immediately).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long, orderBy: Seq[Column] = Seq.empty): (Int, Long) = {
    // the read is lazy — writing into (or under) the input would
    // overwrite files mid-scan, the exact hazard cdcMergeSink documents.
    // Qualify both paths through the filesystem (scheme + authority +
    // cwd-resolution) so a relative vs absolute vs scheme-qualified
    // spelling of the SAME directory cannot bypass the guard.
    val conf = spark.sessionState.newHadoopConf()
    def qualified(dir: String): String = {
      val p = new Path(dir)
      // makeQualified pins scheme/authority and resolves cwd-relative
      // paths; URI.normalize() collapses ./ and ../ segments it leaves.
      // Rebuild from components: a null vs empty authority renders as
      // "file:/x" vs "file:///x" — same directory, different strings.
      val u = p.getFileSystem(conf).makeQualified(p).toUri.normalize()
      val auth = Option(u.getAuthority).getOrElse("")
      s"${u.getScheme}://$auth${u.getPath.stripSuffix("/")}"
    }
    val inP = qualified(inDir)
    val outP = qualified(outDir)
    require(inP != outP && !outP.startsWith(inP + "/") && !inP.startsWith(outP + "/"),
      s"compact output '$outDir' must not equal or nest with input '$inDir'")
    val bytes = dataBytes(spark, inDir)
    val n = plannedFiles(bytes, targetFileBytes)
    val df = spark.read.parquet(inDir)
    val shaped =
      if (orderBy.isEmpty) df.coalesce(n)
      else df.repartitionByRange(n, orderBy: _*).sortWithinPartitions(orderBy: _*)
    shaped.write.mode("overwrite").parquet(outDir)
    (n, bytes)
  }
}
