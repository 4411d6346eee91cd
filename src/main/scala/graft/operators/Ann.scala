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
  /** A dim mismatch would make zip_with null-pad, every projection null,
    * and every row land in bucket 0 of every table — i.e. a silent full
    * cross-product downstream. Fail fast instead (one cheap head probe).
    */
  private def checkDim(df: DataFrame, dim: Int): Unit =
    df.select(size(col("e"))).head(1).foreach { r =>
      require(r.getInt(0) == dim,
        s"embedding dim ${r.getInt(0)} != configured dim $dim")
    }

  def bucketKeys(df: DataFrame, tables: Int = 16, planesPerTable: Int = 5,
                 dim: Int = 64, seed: Long = 42L): DataFrame = {
    checkDim(df, dim)
    val ps = planes(tables, planesPerTable, dim, seed)
    val bucketCols = ps.map { table =>
      table.zipWithIndex.map { case (plane, j) =>
        when(dot(col("e"), typedlit(plane)) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    df.select(col("*"),
      posexplode(array(bucketCols.toIndexedSeq: _*)).as(Seq("table", "bucket")))
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
    val ps = planes(tables, planesPerTable, dim, seed)
    // Materialize each projection once: bucket bits AND margins read it,
    // and 2×tables×planes aggregate-folds per row is the kind of cost
    // Catalyst's CSE won't reliably elide across a sort_array boundary.
    val projected = df.select(col("*") +: ps.zipWithIndex.flatMap { case (tbl, t) =>
      tbl.zipWithIndex.map { case (plane, j) =>
        dot(col("e"), typedlit(plane)).as(s"__proj_${t}_$j")
      }
    }: _*)
    val probeStructs: Seq[Column] = (0 until tables).map { t =>
      val bucket = (0 until planesPerTable).map { j =>
        when(col(s"__proj_${t}_$j") >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
      // (|margin|, plane) ascending: ties impossible (distinct plane ids)
      val margins = sort_array(array((0 until planesPerTable).map { j =>
        struct(abs(col(s"__proj_${t}_$j")).as("m"), lit(j).as("j"))
      }: _*))
      // flip mask for a plane index carried in a column (planes are few,
      // so a when-cascade stays codegen'd; shiftleft needs a literal)
      def mask(jCol: Column): Column =
        coalesce((0 until planesPerTable).map(j =>
          when(jCol === j, lit(1L << j))): _*)
      val singles = (0 until math.min(nprobe, planesPerTable)).map { r =>
        bucket.bitwiseXOR(mask(element_at(margins, r + 1).getField("j")))
      }
      // pair probe: both nearest planes flipped together. The Hamming-2
      // bucket most likely to hold a neighbour is the one crossing BOTH
      // closest boundaries — one extra probe per table recovers it
      // (single flips only reach Hamming-1 buckets). Ordered after the
      // singles per the multi-probe likelihood ranking.
      val pairs = if (nprobe >= 2 && planesPerTable >= 2)
        Seq(bucket
          .bitwiseXOR(mask(element_at(margins, 1).getField("j")))
          .bitwiseXOR(mask(element_at(margins, 2).getField("j"))))
      else Nil
      val probes = bucket +: (singles ++ pairs)
      transform(array(probes: _*),
        (b: Column) => struct(lit(t).as("table"), b.as("bucket")))
    }
    projected
      .withColumn("__tb", explode(flatten(array(probeStructs: _*))))
      .select(df.columns.map(col).toIndexedSeq
        :+ col("__tb.table").as("table") :+ col("__tb.bucket").as("bucket"): _*)
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
  def lshTopK(queries: DataFrame, data: DataFrame, k: Int,
              tables: Int = 16, planesPerTable: Int = 5, dim: Int = 64,
              seed: Long = 42L, nprobe: Int = 0): DataFrame = {
    graft.functions.CosineSimilarity.register(queries.sparkSession)
    val qk = if (nprobe > 0)
      probedBucketKeys(queries, tables, planesPerTable, dim, seed, nprobe)
    else bucketKeys(queries, tables, planesPerTable, dim, seed)
    val qb = qk.select(col("vec_id").as("qid"), col("e").as("qe"),
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
