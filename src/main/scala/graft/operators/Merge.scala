package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CDC merge — the snapshot-maintenance primitive of an ingestion
  * pipeline: apply a changeset (upserts and deletes) onto a base
  * snapshot, producing the next snapshot.
  *
  * Shape chosen for scale: both inputs are unioned and reduced with ONE
  * hash shuffle on the key (window + row_number), instead of the
  * join-based formulation (anti-join + union = two shuffles of the big
  * side, or a full outer join that breaks on duplicate keys). Map-side
  * the union is free; the single shuffle is the theoretical floor for
  * key-wise last-writer-wins. With AQE the post-merge partitioning is
  * already keyed by the merge key — a downstream groupBy/join on the
  * same key reuses it.
  *
  * Semantics (Delta/Iceberg MERGE with latest-wins tie-break):
  *   - a change row with the same key REPLACES the base row;
  *   - several change rows for one key: highest `versionCol` wins
  *     (callers must make the version a total order within each key —
  *     equal-version ties are unspecified, as in any CDC log without
  *     per-key sequence numbers);
  *   - a change row whose `opCol` equals `deleteOp` removes the key;
  *   - keys only in base pass through untouched.
  *
  * PRECONDITION: `base` is key-unique (it is a snapshot — exactly the
  * invariant this operator maintains). A base with duplicate keys would
  * keep ONE arbitrary row per key; dedupe upstream if ingesting a
  * non-snapshot source.
  */
object Merge {

  /** Last-writer-wins upsert of `changes` onto `base` (no deletes).
    * Columns of both frames must match. `version` orders change rows
    * WITHIN a key; base rows rank below every change row.
    */
  def upsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
             version: Column): DataFrame =
    applyCdc(base, changes, keys, version, opCol = null, deleteOp = null)

  /** Full CDC apply: upserts + deletes. `opCol` (a column NAME in
    * `changes`) marks each change row; rows with value `deleteOp` are
    * tombstones that remove the key from the result. Pass `opCol = null`
    * for pure upserts.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keys: Seq[String],
               version: Column, opCol: String, deleteOp: String): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val dataCols = base.columns.toSeq
    val reserved = Seq("_is_change", "_ver", "_del", "_rn")
    require(dataCols.intersect(reserved).isEmpty,
      s"merge reserves internal column names $reserved; rename the " +
        s"conflicting base columns ${dataCols.intersect(reserved)}")
    val hasOp = opCol != null
    require(dataCols.forall(changes.columns.contains),
      s"changes must contain every base column $dataCols " +
        s"(has ${changes.columns.toSeq}); extra columns (version, op) are dropped")

    // base rows sort below all change rows; within changes, version wins
    val meta = Seq("_is_change", "_ver", "_del")
    val b = base
      .withColumn("_is_change", lit(0))
      .withColumn("_ver", lit(null).cast("long"))
      .withColumn("_del", lit(false))
    val c = changes
      .withColumn("_is_change", lit(1))
      .withColumn("_ver", version.cast("long"))
      // a NULL op value must read as "not a delete", not as SQL NULL —
      // `null === deleteOp` is NULL and the `!_del` filter would silently
      // DROP the row instead of upserting it
      .withColumn("_del",
        if (hasOp) coalesce(col(opCol) === deleteOp, lit(false)) else lit(false))
      .select((dataCols ++ meta).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_is_change").desc, col("_ver").desc_nulls_last)
    b.unionByName(c)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_del"))
      .select(dataCols.map(col): _*)
  }
}
