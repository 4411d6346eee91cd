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

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x: Column, y: Column) => x * y),
      lit(0.0), (acc: Column, x: Column) => acc + x)

  /** (row, table, bucket) keys: one bucket id per LSH table. Input must
    * have an `e: array<double>` column.
    */
  def bucketKeys(df: DataFrame, tables: Int = 16, planesPerTable: Int = 5,
                 dim: Int = 64, seed: Long = 42L): DataFrame = {
    // A dim mismatch would make zip_with null-pad, every projection null,
    // and every row land in bucket 0 of every table — i.e. a silent full
    // cross-product downstream. Fail fast instead (one cheap head probe).
    df.select(size(col("e"))).head(1).foreach { r =>
      require(r.getInt(0) == dim,
        s"embedding dim ${r.getInt(0)} != configured dim $dim")
    }
    val ps = planes(tables, planesPerTable, dim, seed)
    val bucketCols = ps.map { table =>
      table.zipWithIndex.map { case (plane, j) =>
        when(dot(col("e"), typedlit(plane)) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    df.select(col("*"),
      posexplode(array(bucketCols.toIndexedSeq: _*)).as(Seq("table", "bucket")))
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
                     seed: Long = 42L): DataFrame = {
    val qb = bucketKeys(queries, tables, planesPerTable, dim, seed)
      .select(col("vec_id").as("qid"), col("table"), col("bucket"))
    val db = bucketKeys(data, tables, planesPerTable, dim, seed)
      .select(col("vec_id"), col("table"), col("bucket"))
    qb.join(db, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id")).distinct()
      .groupBy(col("qid")).agg(count(lit(1)).as("n_candidates"))
  }

  /** LSH top-k: compare each query only against same-bucket candidates
    * from any of the L tables.
    */
  def lshTopK(queries: DataFrame, data: DataFrame, k: Int,
              tables: Int = 16, planesPerTable: Int = 5, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    graft.functions.CosineSimilarity.register(queries.sparkSession)
    val qb = bucketKeys(queries, tables, planesPerTable, dim, seed)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("table"), col("bucket"))
    val db = bucketKeys(data, tables, planesPerTable, dim, seed)
      .select(col("vec_id"), col("e"), col("table"), col("bucket"))
    val cand = qb.join(db, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "qe", "vec_id", "e")
      .dropDuplicates("qid", "vec_id")
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("vec_id").asc)
    cand
      .withColumn("c", round(graft.functions.CosineSimilarity(col("qe"), col("e")), 5))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("vec_id"), col("c"))
  }
}
