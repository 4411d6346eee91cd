package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbour search over an embedding column — the
  * scale path for `sim_topk` (SURVEY.md §2.3).
  *
  * Random-hyperplane LSH (signed projections → bit buckets), with L
  * independent tables to recover recall: a query only compares against
  * vectors sharing a bucket in ≥1 table, so the candidate set is
  * |tables| × (n / 2^planes) on average instead of n. All plain DataFrame
  * ops: the bucket join is an equi shuffle join, per-query top-k is a
  * bounded window. Brute force (`bruteTopK`) is the exact baseline the
  * recall tests measure against.
  */
object Ann {
  /** Deterministic unit-free hyperplanes: tables × planes × dim gaussians. */
  private def planes(tables: Int, planesPerTable: Int, dim: Int,
                     seed: Long): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables, planesPerTable, dim)(rnd.nextGaussian())
  }

  /** Fast-fail nicety: catch a mis-configured dim from the FIRST row
    * before launching the real job ([[graft.functions.LshProbes]] also
    * validates EVERY row — length and element nulls — at eval time, so
    * ragged rows past the head fail loud there, not silently). Rows
    * whose whole `e` is NULL emit no bucket keys at all (the expression
    * propagates null, posexplode drops it): an unindexable vector simply
    * doesn't participate — filter or fail upstream if that's unexpected.
    */
  private def checkDim(df: DataFrame, dim: Int): Unit =
    df.select(size(col("e"))).head(1).foreach { r =>
      require(r.getInt(0) == dim,
        s"embedding dim ${r.getInt(0)} != configured dim $dim")
    }

  /** All tables' probe lists in one fused pass ([[graft.functions.LshProbes]]
    * — the Column-tree formulation interprets tables × planes separate
    * HOF folds per row; the expression runs one compiled loop nest).
    * Spark 4's Column has no public Expression accessor, so the
    * configured expression is exposed through the function registry
    * under a per-configuration name (idempotent re-registration), the
    * same seam [[graft.functions.CosineSimilarity]] uses.
    */
  private def probeLists(df: DataFrame, tables: Int, planesPerTable: Int,
                         dim: Int, seed: Long, nprobe: Int): Column = {
    // 'm' for minus: a raw negative seed would put '-' in the function
    // name and call_function's identifier parse rejects it (replace, not
    // negate: -Long.MinValue is still negative)
    val seedTag = seed.toString.replace('-', 'm')
    val name = s"lsh_probes_${tables}_${planesPerTable}_${dim}_${seedTag}_$nprobe"
    val ps = planes(tables, planesPerTable, dim, seed)
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => graft.functions.LshProbes(exprs.head, ps, nprobe), "scala_udf")
    call_function(name, col("e"))
  }

  def bucketKeys(df: DataFrame, tables: Int = 16, planesPerTable: Int = 5,
                 dim: Int = 64, seed: Long = 42L): DataFrame = {
    checkDim(df, dim)
    df.select(col("*"),
        posexplode(probeLists(df, tables, planesPerTable, dim, seed, nprobe = 0))
          .as(Seq("table", "probes")))
      .withColumn("bucket", element_at(col("probes"), 1))
      .drop("probes")
  }

  /** Multi-probe bucket keys (query side only): besides its own bucket in
    * each table, a query also probes the buckets reachable by flipping the
    * `nprobe` hyperplane bits with the SMALLEST projection margin — the
    * planes the query sits closest to, i.e. the flips most likely to hold
    * its true neighbours (Lv et al., VLDB 2007, "Multi-Probe LSH").
    *
    * The scale argument vs adding tables: doubling `tables` doubles the
    * DATA-side index (the 100 TB cost — every vector keyed into every
    * table) for ~2× candidates; multi-probe leaves the data-side index
    * untouched and only explodes the tiny query side by (1 + nprobe [+ 1
    * pair probe at nprobe >= 2: the bucket across BOTH nearest
    * boundaries])×, while targeting the extra probes at the likeliest
    * buckets instead of independent re-hashes. Candidate growth is
    * sub-linear in probes because probe buckets overlap the base
    * bucket's neighbourhood.
    */
  def probedBucketKeys(df: DataFrame, tables: Int = 16, planesPerTable: Int = 5,
                       dim: Int = 64, seed: Long = 42L, nprobe: Int = 2): DataFrame = {
    checkDim(df, dim)
    // one LshProbes pass emits every table's ordered probe list (base,
    // single flips by ascending |margin|, then the Hamming-2 pair flip
    // of the two nearest planes); two explodes key the rows
    df.select(col("*"),
        posexplode(probeLists(df, tables, planesPerTable, dim, seed, nprobe))
          .as(Seq("table", "probes")))
      .select(df.columns.map(col).toIndexedSeq :+ col("table")
        :+ explode(col("probes")).as("bucket"): _*)
  }

  /** Exact brute-force cosine top-k per query (the baseline). Both inputs
    * need (id, e, norm); queries should be small enough to broadcast.
    */
  def bruteTopK(queries: DataFrame, data: DataFrame, k: Int): DataFrame = {
    graft.functions.CosineSimilarity.register(queries.sparkSession)
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("e").as("qe")))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("vec_id").asc)
    q.join(data, col("vec_id") =!= col("qid"))
      .withColumn("c", round(graft.functions.CosineSimilarity(col("qe"), col("e")), 5))
      // narrow before the rank exchange — see Pq.topKByDistance
      .select(col("qid"), col("vec_id"), col("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("vec_id"), col("c"))
  }

  /** Per-query distinct-candidate count — the measured cost side of the
    * tables × planes dial: exactly the pairs [[lshTopK]] scores (same
    * bucket join, same self-exclusion, same dedup across tables).
    */
  def candidateStats(queries: DataFrame, data: DataFrame,
                     tables: Int = 16, planesPerTable: Int = 5, dim: Int = 64,
                     seed: Long = 42L, nprobe: Int = 0): DataFrame = {
    val qk = if (nprobe > 0)
      probedBucketKeys(queries, tables, planesPerTable, dim, seed, nprobe)
    else bucketKeys(queries, tables, planesPerTable, dim, seed)
    val qb = qk.select(col("vec_id").as("qid"), col("table"), col("bucket"))
    val db = bucketKeys(data, tables, planesPerTable, dim, seed)
      .select(col("vec_id"), col("table"), col("bucket"))
    qb.join(db, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id")).distinct()
      .groupBy(col("qid")).agg(count(lit(1)).as("n_candidates"))
  }

  /** LSH top-k: compare each query only against same-bucket candidates
    * from any of the L tables. `nprobe > 0` adds multi-probe on the query
    * side ([[probedBucketKeys]]) — recall of a much larger table count at
    * the data-side index cost of this one.
    */
  /** The data side's (vec_id, e, table, bucket) index plus the exact
    * hashing configuration it was built with — a TYPED carrier so a
    * prebuilt index can't silently join against queries hashed with
    * different planes (same bucket ids, different geometry: plausible
    * but garbage neighbours). Built once for reuse across many query
    * batches; cache/persist `keys` at the call site (the streaming sink
    * does, and unpersists on query termination).
    */
  final case class AnnIndex(keys: DataFrame, tables: Int, planesPerTable: Int,
                            dim: Int, seed: Long)

  def dataIndex(data: DataFrame, tables: Int = 16, planesPerTable: Int = 5,
                dim: Int = 64, seed: Long = 42L): AnnIndex =
    AnnIndex(bucketKeys(data, tables, planesPerTable, dim, seed)
      .select(col("vec_id"), col("e"), col("table"), col("bucket")),
      tables, planesPerTable, dim, seed)

  /** LSH top-k. With `index` set, `data` is ignored (the index IS the
    * data side) and the index's recorded configuration must match the
    * query-side parameters — checked, because a mismatch still joins.
    */
  def lshTopK(queries: DataFrame, data: DataFrame, k: Int,
              tables: Int = 16, planesPerTable: Int = 5, dim: Int = 64,
              seed: Long = 42L, nprobe: Int = 0,
              index: Option[AnnIndex] = None): DataFrame = {
    index.foreach { ix =>
      require(ix.tables == tables && ix.planesPerTable == planesPerTable &&
        ix.dim == dim && ix.seed == seed,
        s"prebuilt index built with (tables=${ix.tables}, planes=" +
          s"${ix.planesPerTable}, dim=${ix.dim}, seed=${ix.seed}) but " +
          s"queries hash with ($tables, $planesPerTable, $dim, $seed)")
    }
    graft.functions.CosineSimilarity.register(queries.sparkSession)
    val qk = if (nprobe > 0)
      probedBucketKeys(queries, tables, planesPerTable, dim, seed, nprobe)
    else bucketKeys(queries, tables, planesPerTable, dim, seed)
    val qb = qk.select(col("vec_id").as("qid"), col("e").as("qe"),
        col("table"), col("bucket"))
    val db = index.map(_.keys)
      .getOrElse(dataIndex(data, tables, planesPerTable, dim, seed).keys)
    // Score BEFORE the cross-table dedup: c is functionally determined by
    // (qid, vec_id), so a pair surfacing in several tables just recomputes
    // the same 64-flop cosine — far cheaper than shipping two 512-byte
    // embeddings per row through the dedup exchange. Both the dedup and
    // the rank window then move only (qid, vec_id, c).
    val cand = qb.join(db, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("c", round(graft.functions.CosineSimilarity(col("qe"), col("e")), 5))
      .select("qid", "vec_id", "c")
      .dropDuplicates("qid", "vec_id")
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("vec_id").asc)
    cand
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("vec_id"), col("c"))
  }
}
