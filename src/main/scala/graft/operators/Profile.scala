package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality audit pass every ingestion run
  * schedules: per column, row count, null count, distinct count and
  * string min/max, as one narrow (column × metric) relation.
  *
  * One aggregation job over the table produces every metric (a wide
  * single-row aggregate), then a `stack` unpivots to the narrow form —
  * the table is scanned ONCE no matter how many columns are profiled.
  *
  * `exact = true` uses `count(DISTINCT col)` per column: n columns of
  * multi-distinct plan as an n+1-way Expand of every row — fine for a
  * profile-sized slice, wrong at corpus scale. The default
  * `exact = false` uses `approx_count_distinct` (HyperLogLog++, one
  * pass, no Expand), which is the 100 TB shape; exact mode exists for
  * small tables and for oracle checking.
  */
object Profile {

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__distinct_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // stack(n, 'c1', m1a, m1b, ..., 'c2', ...) → one row per column
    val stackArgs = cols.map { c =>
      s"'$c', __nulls_$c, __distinct_$c, __min_$c, __max_$c"
    }.mkString(", ")
    wide.selectExpr("__n AS n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, v_min, v_max)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("v_min"), col("v_max"))
  }
}
