package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins (SURVEY.md scale notes; PERF.md).
  *
  * When one join key dominates (a hot user, a null-like sentinel), every
  * row of that key lands on one reducer. Salting splits the hot key's
  * left rows across `factor` sub-partitions deterministically and
  * replicates the right side `factor`× so every sub-partition can still
  * find its match. Result is EXACTLY the plain equi-join, with the
  * skewed reducer's work divided by `factor`.
  *
  * (AQE's skew-join handles sort-merge skew automatically at runtime;
  * explicit salting remains the tool for aggregations and for joins AQE
  * can't split, and it works identically on any Spark.)
  */
object Salt {
  /** left ⋈ right on leftKey = rightKey, salted `factor` ways. `saltOn`
    * must be a deterministic left-side column (ideally unique) — the salt
    * is a hash of it, NOT a random number, so retries/recomputation see
    * the same assignment.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     saltOn: Column, factor: Int): DataFrame = {
    require(factor > 0)
    val l = left.withColumn("_salt", pmod(xxhash64(saltOn), lit(factor.toLong)))
    val r = right.withColumn("_salt",
      explode(transform(sequence(lit(0), lit(factor - 1)), i => i.cast("long"))))
    l.join(r, l(leftKey) === r(rightKey) && l("_salt") === r("_salt"), "inner")
      .drop("_salt")
  }
}
