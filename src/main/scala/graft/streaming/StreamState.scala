package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable batch-versioned state for the accumulator sinks (round-16
  * verdict #2). The `foreachBatch` accumulator sinks keep their state
  * in driver-local frames OUTSIDE the streaming checkpoint, so a
  * restart silently reset cumulative state — the documented single-run
  * contract. This store is the restart-correct option: after each
  * batch a sink writes its state frames under `stateDir/v<batchId>`
  * with a one-row `commitmeta` written LAST (the [[
  * graft.operators.Artifacts]] commit-marker rule: a crash mid-write
  * leaves an uncommitted version [[latest]] never lists), and on its
  * FIRST batch after a restart loads the newest committed version
  * STRICTLY BELOW the delivered batchId — which makes re-delivery
  * exact: if batch N crashed after writing v(N) but before the
  * streaming commit, the engine re-delivers N, the sink restores
  * v(N−1), recomputes, and the `overwrite` writes make v(N)
  * idempotent. Superseded versions are pruned after each commit —
  * keeping the TWO newest committed versions, not one: the strictly-
  * below restore rule means a re-delivered crash batch N asks for
  * v(N−1), so pruning v(N−1) at v(N)'s commit would make the exact
  * crash window this store exists for restart from EMPTY state
  * (round-18 ADVICE high). A restart can therefore only ever ask for
  * the newest or second-newest version, and the store holds TWO
  * versions of the state, not a history.
  *
  * All IO is DataFrame parquet + the Hadoop FileSystem API — the same
  * cluster-portability argument as Artifacts.
  */
object StreamState {
  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def versionOf(name: String): Option[Long] =
    if (name.length > 1 && name.head == 'v' && name.tail.forall(_.isDigit))
      Some(name.tail.toLong)
    else None

  /** Commit `frames` (+ scalar `meta`) as version `batchId`, then prune
    * superseded versions — all but the two newest COMMITTED versions
    * (v(batchId) and its predecessor: the crash-window restore target),
    * plus any stale uncommitted (crashed) version dirs below `batchId`.
    */
  def write(s: SparkSession, stateDir: String, batchId: Long,
            frames: Seq[(String, DataFrame)],
            meta: Seq[(String, Long)] = Nil): Unit = {
    val v = s"$stateDir/v$batchId"
    frames.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$v/$n") }
    import s.implicits._
    (("batch_id" -> batchId) +: meta).toDF("k", "x")
      .coalesce(1).write.mode("overwrite").parquet(s"$v/commitmeta")
    val f = fs(s, stateDir)
    val keep = f.listStatus(new Path(stateDir)).toSeq
      .flatMap(st => versionOf(st.getPath.getName))
      .filter(x => f.exists(new Path(s"$stateDir/v$x/commitmeta")))
      .sorted.takeRight(2).toSet
    f.listStatus(new Path(stateDir)).foreach { st =>
      versionOf(st.getPath.getName)
        .filter(x => x < batchId && !keep.contains(x))
        .foreach(_ => f.delete(st.getPath, true))
    }
  }

  /** Newest COMMITTED version strictly below `below` (the re-delivery
    * rule), or None on a clean start.
    */
  def latest(s: SparkSession, stateDir: String, below: Long): Option[Long] = {
    val f = fs(s, stateDir)
    val p = new Path(stateDir)
    if (!f.exists(p)) None
    else f.listStatus(p).toSeq
      .flatMap(st => versionOf(st.getPath.getName))
      .filter(v => v < below && f.exists(new Path(s"$stateDir/v$v/commitmeta")))
      .sorted.lastOption
  }

  def frame(s: SparkSession, stateDir: String, v: Long, name: String): DataFrame =
    s.read.parquet(s"$stateDir/v$v/$name")

  def meta(s: SparkSession, stateDir: String, v: Long): Map[String, Long] =
    s.read.parquet(s"$stateDir/v$v/commitmeta").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
}
