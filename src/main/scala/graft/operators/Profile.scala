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
    // positional aliases + df(...) references, never SQL-text
    // interpolation: a column named `a b`, `it's` or `a.b` must neither
    // break parsing nor be quoted-escaped by hand (df.apply resolves the
    // EXACT name; the label reaches the output via lit, unparsed)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(df(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        (if (exact) countDistinct(df(c))
         else approx_count_distinct(df(c))).as(s"__distinct_$i"),
        min(df(c).cast("string")).as(s"__min_$i"),
        max(df(c).cast("string")).as(s"__max_$i"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // explode an array of per-column structs → one row per column (the
    // typed equivalent of a stack unpivot)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__nulls_$i").as("n_nulls"),
        col(s"__distinct_$i").as("n_distinct"),
        col(s"__min_$i").as("v_min"), col(s"__max_$i").as("v_max"))
    }
    wide.select(col("__n").as("n_rows"), explode(array(entries: _*)).as("m"))
      .select(col("m.col_name"), col("n_rows"), col("m.n_nulls"),
        col("m.n_distinct"), col("m.v_min"), col("m.v_max"))
  }
}
