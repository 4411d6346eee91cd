package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed artifact store — the durable half of the session
  * caches (round-16 verdict #1). [[Graphs]] and [[SimIndexes]] memoize
  * per SESSION: every steady-state `graph_*_idx` / `sim_*_idx` number
  * exists only while one driver JVM stays up, and a restart pays the
  * full rebuild. Production serves an index from a persisted artifact;
  * this object is that artifact's format: one subdirectory per cache
  * entry (named by a digest of the FULL cache key), holding each
  * component frame as plain parquet plus a one-row `manifest` written
  * LAST — the manifest is the commit marker, so a save that dies
  * mid-write leaves a directory [[entries]] never lists, and the
  * recorded key is the ONLY key a loader may install under (the
  * frame-tag rule: a stale artifact can't serve a different edge
  * definition or index configuration, because consumers look up by
  * their own fully-qualified key and a mismatched artifact is simply a
  * cache miss).
  *
  * All IO goes through the DataFrame reader/writer and the Hadoop
  * FileSystem API, so the same artifact layout works on local disk,
  * HDFS, or an object store — at 100 TB the store is the object store,
  * and `overwrite` per component directory keeps saves idempotent.
  * The reference (/root/reference/task.ts) has no analogue; this is
  * engine surface for the brief's production-serving face.
  */
object Artifacts {
  /** Filesystem-safe digest of a cache key (keys embed paths/config). */
  def slug(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Write `frames` under `dir`, then the manifest LAST (the commit
    * marker). `params` carries kind-specific configuration the loader
    * must re-validate (e.g. the LSH plane geometry).
    *
    * Re-saves UNCOMMIT first (round-18 ADVICE): overwriting component
    * frames under a still-committed OLD manifest would let a crash
    * mid-re-save leave a directory [[entries]] lists as committed but
    * whose frames mix old and new data. Deleting the manifest before
    * the first frame write restores the virgin-directory guarantee —
    * a crash anywhere in the window leaves an uncommitted directory
    * loaders never see (stale data loss, never mixed data).
    */
  def write(s: SparkSession, dir: String, key: String, kind: String,
            params: String, frames: Seq[(String, DataFrame)]): Unit = {
    fs(s, dir).delete(new Path(s"$dir/manifest"), true)
    frames.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n") }
    import s.implicits._
    Seq((key, kind, params)).toDF("key", "kind", "params")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
  }

  /** The committed manifest under `dir`, if any: (key, kind, params). */
  def manifest(s: SparkSession, dir: String): Option[(String, String, String)] =
    if (!fs(s, dir).exists(new Path(s"$dir/manifest"))) None
    else s.read.parquet(s"$dir/manifest")
      .select("key", "kind", "params").collect().headOption
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

  /** Every COMMITTED artifact under `base`:
    * (subdir, key, kind, params). Uncommitted (manifest-less) subdirs
    * are invisible by design.
    */
  def entries(s: SparkSession, base: String): Seq[(String, String, String, String)] = {
    val f = fs(s, base)
    val bp = new Path(base)
    if (!f.exists(bp)) Nil
    else f.listStatus(bp).toSeq.filter(_.isDirectory).flatMap { st =>
      manifest(s, st.getPath.toString).map { case (k, kind, p) =>
        (st.getPath.toString, k, kind, p)
      }
    }
  }

  /** Read one component frame back (plain parquet scan — the loaded
    * index inherits pushdown/pruning like any other table).
    */
  def frame(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name")

  /** Content fingerprint of a data directory (file names, lengths,
    * modification times, recursed one level) — baked into artifact
    * paths so a regenerated source tree can never serve a stale index:
    * new data ⇒ new fingerprint ⇒ new (empty) artifact base ⇒ rebuild.
    */
  def fingerprint(s: SparkSession, dir: String): String = {
    val f = fs(s, dir)
    def one(st: org.apache.hadoop.fs.FileStatus): String =
      s"${st.getPath.getName}|${st.getLen}|${st.getModificationTime}"
    val items = f.listStatus(new Path(dir)).flatMap { st =>
      if (st.isDirectory) f.listStatus(st.getPath).map(x => one(st) + "/" + one(x))
      else Array(one(st))
    }
    slug(items.sorted.mkString(","))
  }
}
