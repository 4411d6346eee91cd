package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers shared by every oracle-checked query (SURVEY.md §7.5).
  *
  * The driver hash-compares Spark results against DuckDB, so float outputs
  * must be bit-identical across engines. Discipline:
  *   - money/qty aggregates: cast to DECIMAL(18,2) BEFORE summing (exact math
  *     in both engines, no float-order drift);
  *   - unavoidable float outputs (stddev, cosine, geo): `round(x, 4..6)` with
  *     the same rounding in the SQL text;
  *   - every query ends with a total ORDER BY (unique key suffix).
  */
object Oracle {
  /** DECIMAL(18,2) — the money type used on both engine sides. */
  val Money: DecimalType = DecimalType(18, 2)

  /** Cast to the shared money decimal. */
  def dec(c: Column): Column = c.cast(Money)

  /** DECIMAL(18,4) — product of two 2-dp money factors, kept EXACT.
    * Never scale a decimal down (e.g. 4→2 dp): tie values like x.xx50 are
    * rounded HALF_UP by Spark but not by DuckDB (verified: DuckDB 1.0.0
    * truncates the tie), so lossy decimal casts are banned in oracle
    * queries.
    */
  val Money4: DecimalType = DecimalType(18, 4)

  /** `extendedprice * (1 - discount)` computed exactly in decimal on both
    * sides: each factor is cast to DECIMAL(18,2) first (exact for 2-dp
    * doubles), multiplied (exact decimal math), and kept at scale 4 —
    * lossless, so both engines agree bit-for-bit.
    */
  def revenue(extendedPrice: Column, discount: Column): Column =
    (dec(extendedPrice) * dec(lit(1) - discount)).cast(Money4)

  /** SQL text equivalent of [[revenue]] for the DuckDB oracle. */
  def revenueSql(price: String, disc: String): String =
    s"CAST(CAST($price AS DECIMAL(18,2)) * CAST(1 - $disc AS DECIMAL(18,2)) AS DECIMAL(18,4))"

  /** Final-projection representation cast for DECIMAL outputs.
    *
    * The driver hash-compares STRINGIFIED pandas frames: a Spark DECIMAL
    * parquet column loads as `decimal.Decimal` (str `'138014.00'`, trailing
    * zeros kept) while DuckDB's pandas export is float64 (`'138014.0'`) —
    * so value-identical results hash-mismatch (25 round-1 queries).
    * Keep the exact decimal math INTERNALLY, but cast every decimal output
    * column to DOUBLE in the final projection on BOTH engine sides
    * ([[outSql]]); values were verified bit-identical as doubles. NULL
    * decimals also align (both sides become float64 NaN).
    */
  def out(c: Column): Column = c.cast("double")

  /** SQL text equivalent of [[out]] for the DuckDB oracle. */
  def outSql(e: String): String = s"CAST($e AS DOUBLE)"

  /** Array/struct outputs crash the driver's pandas row-sort (`unhashable
    * type: numpy.ndarray/dict`) — serialize them to JSON text in the final
    * projection. String/int/bool arrays round-trip identically through
    * Spark's `to_json` and DuckDB's `to_json`; float arrays must be
    * fixed-scale-formatted first (see fn_array's head3) because the two
    * engines' shortest-double printers are not guaranteed to agree.
    */
  def json(c: Column): Column = to_json(c)

  /** Total order over every column — required for hash-comparison because
    * the synthetic fixtures do NOT have TPC-H key uniqueness (verified:
    * (l_orderkey, l_linenumber) has ~12k duplicate pairs at sf0.01).
    * Sorting by all output columns makes row order deterministic even with
    * fully duplicate rows.
    */
  def totalOrder(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*)
}
