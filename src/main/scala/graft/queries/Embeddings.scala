package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-column operators for training-data pipelines (round 2):
  * vector statistics/normalisation inputs and int8 scalar quantisation —
  * the storage-reduction step every 100 TB embedding corpus runs before
  * ANN indexing. Pure `functions._` arithmetic over `array<float>`
  * columns: codegen'd, no UDFs, oracle-checked cell-by-cell against
  * DuckDB list lambdas.
  *
  * Float elements are cast to double BEFORE any fold (DuckDB accumulates
  * FLOAT[] in float — verified mismatch, see fn_array) and all math is
  * plain IEEE double arithmetic, identical across engines; `round` only
  * ever touches output columns.
  */
object Embeddings {
  type Q = (SparkSession, String) => DataFrame

  /** embedding as double array. */
  private val E: Column = transform(col("embedding"), (x: Column) => x.cast("double"))

  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc: Column, x: Column) => acc + x)

  val queries: Map[String, Q] = Map(
    // -- per-vector statistics (the normalise-before-index pass) ----------
    // Order-then-project (the text_winnow rule): orderBy first so the
    // RangePartitioner sketch pass samples the raw scan, not a second
    // evaluation of the interpreted array folds.
    "embed_norm" -> { (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id"))
        .select(col("vec_id"), E.as("e"))
        .select(
          col("vec_id"),
          size(col("e")).cast("int").as("n_dims"),
          round(sqrt(foldSum(transform(col("e"), (x: Column) => x * x))), 5).as("l2_norm"),
          round(array_max(transform(col("e"), (x: Column) => abs(x))), 5).as("max_abs"),
          round(foldSum(col("e")) / size(col("e")), 6).as("mean"))
    },

    // -- int8 symmetric scalar quantisation --------------------------------
    // scale = max|x|/127 (floored at 1e-12 for zero vectors); code_i =
    // floor(x_i/scale + 0.5) ∈ [−127, 127]; reported: the scale and the
    // worst/mean reconstruction error. floor(+0.5) instead of round() so
    // both engines apply the identical tie rule to the identical double.
    "embed_quantize" -> { (s, dir) =>
      val scale = greatest(
        array_max(transform(col("e"), (x: Column) => abs(x))) / 127, lit(1e-12))
      val recon = transform(col("e"),
        (x: Column) => floor(x / col("scale") + 0.5) * col("scale"))
      val errs = zip_with(col("e"), col("recon"), (x: Column, r: Column) => abs(x - r))
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id"))  // order-then-project, see embed_norm
        .select(col("vec_id"), E.as("e"))
        .withColumn("scale", scale)
        .withColumn("recon", recon)
        .withColumn("errs", errs)
        .select(
          col("vec_id"),
          round(col("scale"), 6).as("scale"),
          round(array_max(col("errs")), 6).as("max_err"),
          round(foldSum(col("errs")) / size(col("errs")), 6).as("mean_err"))
    }
  )

  val oracle: Map[String, String] = Map(
    "embed_norm" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings)
        |SELECT vec_id,
        |CAST(len(e) AS INT) AS n_dims,
        |ROUND(sqrt(list_inner_product(e, e)), 5) AS l2_norm,
        |ROUND(list_max(list_transform(e, x -> abs(x))), 5) AS max_abs,
        |ROUND(list_sum(e) / len(e), 6) AS mean
        |FROM v ORDER BY vec_id""".stripMargin,

    "embed_quantize" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
        |s AS (SELECT vec_id, e,
        |        greatest(list_max(list_transform(e, x -> abs(x))) / 127, 1e-12) AS scale
        |      FROM v),
        |r AS (SELECT vec_id, scale,
        |        list_transform(e, x -> abs(x - floor(x / scale + 0.5) * scale)) AS errs
        |      FROM s)
        |SELECT vec_id,
        |ROUND(scale, 6) AS scale,
        |ROUND(list_max(errs), 6) AS max_err,
        |ROUND(list_sum(errs) / len(errs), 6) AS mean_err
        |FROM r ORDER BY vec_id""".stripMargin
  )
}
