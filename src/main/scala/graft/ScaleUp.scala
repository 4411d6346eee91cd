package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-stress fixture generator: replicate an sf directory N× with
  * key offsets, producing a PERF.md datapoint between the toy SFs and
  * the 100 TB design target.
  * `sbt "runMain graft.ScaleUp <srcDir> <outDir> [factor]"`.
  *
  * Replication is keyed so the workload scales the way organic data
  * would, instead of manufacturing pathologies:
  *   - all join/group keys get a per-replica offset, so joins keep their
  *     fan-out and groupBys their per-key cardinality (a naive copy
  *     would multiply every key's frequency by N — skew, not scale);
  *   - document TEXT passes through a per-replica substitution cipher
  *     (rotate the alphabet by the replica index): shingle/minhash/
  *     simhash structure WITHIN a replica is preserved bit-for-bit,
  *     while cross-replica shingles are disjoint — so dedup workloads
  *     see N independent corpora, the honest linear-scaling ground
  *     truth (appending a replica tag instead would make every doc a
  *     near-dup of its 9 clones and inflate candidates super-linearly);
  *   - event timestamps are normalized through [[Tables.events]] (µs
  *     TimestampType regardless of which fixture generation wrote the
  *     source — LONG nanos or TIMESTAMP(MICROS)) and each replica is
  *     shifted past the previous one's span, so the output is readable
  *     by the same Tables.events contract it was read with.
  */
object ScaleUp {
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <outDir> [factor]")
    val spark = LocalSession.create("32",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    run(spark, args(0), args(1),
      if (args.length > 2) args(2).toInt else 10)
    spark.stop()
  }

  /** The replication body, callable from tests (FixtureSchemaSpec pins
    * that ScaleUp output surfaces the SAME logical schema through
    * [[Tables]] as its source — decade numbers must never mix fixture
    * generations OR loader contracts).
    */
  def run(spark: org.apache.spark.sql.SparkSession,
          src: String, out: String, factor: Int): Unit = {

    def replicate(name: String, shift: (DataFrame, Int) => DataFrame,
                  baseOverride: Option[DataFrame] = None): Unit = {
      val base = baseOverride.getOrElse(spark.read.parquet(s"$src/$name.parquet"))
      val all = (0 until factor).map(i => shift(base, i)).reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name -> ${factor}x")
    }
    // Offset precondition: replica i shifts a key by i*step, so the source
    // key range must fit inside one step or replicas silently COLLIDE —
    // duplicate keys make every downstream join fan out and the "Nx"
    // numbers measure join explosion, not scale. The natural way to hit
    // this is chaining ScaleUp onto its own output (keys already span
    // factor*step); fail loudly instead. `ts` opts out: its step is the
    // source's own span (relative shift), not a key-range bound.
    def rot(df: DataFrame, c: String, i: Int, step: Long,
            keyCheck: Boolean = true): DataFrame = {
      if (keyCheck && i == 0) { // once per table load; every replica shares `df`
        val mx = df.agg(max(col(c))).head().getAs[Number](0).longValue()
        require(mx < step,
          s"$c max $mx >= replica step $step — key offsets would collide " +
            "across replicas (is srcDir already a ScaleUp output?)")
      }
      df.withColumn(c, col(c) + lit(i * step))
    }

    replicate("orders", (df, i) =>
      rot(rot(df, "o_orderkey", i, 10000000L), "o_custkey", i, 1000000L))
    replicate("customer", (df, i) => rot(df, "c_custkey", i, 1000000L))
    replicate("lineitem", (df, i) =>
      rot(rot(rot(df, "l_orderkey", i, 10000000L),
        "l_partkey", i, 1000000L), "l_suppkey", i, 1000000L))
    // events: shift each replica's timestamps past the previous one.
    // Replicating INTO the same time span would multiply temporal
    // density ×N, and keyless interval joins (join_overlap,
    // join_range_binned) would then legitimately produce ~N² pairs —
    // a different workload, not the same workload at N× scale. A real
    // N× corpus covers more TIME, not the same hour N times over.
    val evBase = Tables.events(spark, src)
    val evRange = evBase
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val spanMicros = evRange.getLong(1) - evRange.getLong(0) +
      2L * 3600L * 1000000L
    replicate("events", (df, i) =>
      rot(rot(df, "event_id", i, 10000000L), "user_id", i, 1000000L)
        .withColumn("ts",
          timestamp_micros(unix_micros(col("ts")) + i * spanMicros)),
      baseOverride = Some(evBase))
    replicate("documents", (df, i) => {
      // a PERMUTATION per replica, not a rotation: rotations wrap at 26,
      // so factor > 26 would hand replicas i and i+26 the SAME cipher —
      // their docs become genuine cross-replica duplicates and the
      // "scaled" dedup workload silently gains ~N²/26 extra true pairs
      // (observed: 32× the expected pair count at factor 100)
      val perm = new scala.util.Random(i.toLong).shuffle(Lower.toList).mkString
      rot(df, "doc_id", i, 1000000L)
        .withColumn("text",
          translate(col("text"), Lower + Upper, perm + perm.toUpperCase))
    })
    // embeddings: a DIMENSION permutation per replica — the vector
    // analogue of the documents cipher. Permutation matrices are
    // orthogonal, so every norm and every within-replica pairwise
    // dot/cosine is preserved mathematically (up to FP summation order:
    // the permutation reorders the fold, so last-ulp drift can flip a
    // pair sitting exactly on a round(c,6) >= threshold boundary between
    // replica 0 and a permuted replica; identical after round-6 away from
    // that measure-zero edge), while cross-replica pairs decorrelate to
    // the independent-vector baseline. A plain vec_id
    // offset (the pre-r7 behavior) hands every vector N−1 exact clones
    // across replicas: embedding-dedup true pairs then grow ~N²/2 per
    // distinct point (duplicate explosion, not scale) and ANN top-k
    // degenerates into tie-breaking among identical copies. Replica 0
    // keeps the identity so the scaled corpus strictly contains the base.
    val dim = spark.read.parquet(s"$src/embeddings.parquet")
      .selectExpr("size(embedding)").head().getInt(0)
    replicate("embeddings", (df, i) => {
      val shifted = rot(df, "vec_id", i, 1000000L)
      if (i == 0) shifted
      else {
        val perm = new scala.util.Random(i.toLong).shuffle((1 to dim).toList)
        shifted.withColumn("embedding",
          array(perm.map(p => element_at(col("embedding"), p)): _*))
      }
    })
    // part/supplier replicate WITH the same key offsets lineitem's FKs get
    // (the TPC-H scaling rule: dims grow linearly with SF). Leaving them
    // unreplicated while shifting l_partkey/l_suppkey would break
    // referential integrity for every replica > 0 — the part/supplier
    // joins of tpch_q2/q9/q11/q16/q20 would match only replica 0, so
    // their "Nx" datapoints would measure a scan that grows over a join
    // that doesn't (exactly the bug round 5's first fixture had).
    // s_nationkey / n_regionkey are NOT shifted: nation/region stay the
    // fixed 25/5-row broadcast dims, as in TPC-H at every SF.
    replicate("part", (df, i) => rot(df, "p_partkey", i, 1000000L))
    replicate("supplier", (df, i) => rot(df, "s_suppkey", i, 1000000L))
    for (t <- Seq("region", "nation")) {
      val p = new java.io.File(s"$src/$t.parquet")
      if (p.exists())
        spark.read.parquet(p.toString).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }
}
