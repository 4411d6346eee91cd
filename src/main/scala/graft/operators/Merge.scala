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

  /** Type-2 dimension build from a change stream — the `merge_scd2`
    * operator body (extracted round 16 so the late-data correction and
    * the streaming sink run the SAME versioning code): collapse
    * `events` (user_id, ts, event_id, event_type) into one row per
    * (entity, state run) with a version number, a half-open
    * [valid_from, valid_to) range, and the is_current flag. Run
    * boundaries are change points under the TOTAL order (ts, event_id)
    * — the tie break makes version assignment engine-independent;
    * valid_to = the next version's valid_from, so ranges compose into a
    * gapless history (the property an as-of join against the dimension
    * depends on). Scale shape: two window passes over the entity
    * partition and nothing else — the same entity-keyed exchange serves
    * change detection, the version cumsum, and the range close.
    */
  def scd2Dim(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val runs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.filter(col("chg") === 1)
      .withColumn("valid_to", lead(col("ts"), 1).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)))
      .select(col("user_id"), col("version"),
        col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Late-data SCD2 correction: given the dimension built from the
    * events seen so far and a LATE batch (out-of-order arrivals — a
    * late event may land MID-history and split an existing validity
    * range, renumbering every later version of that entity), produce
    * the corrected dimension. Only entities the late batch touches are
    * re-versioned — their FULL history (`allEvents` semi-joined on the
    * affected set) re-runs [[scd2Dim]]'s windows — while every other
    * entity's rows pass through untouched (entity-keyed anti-join).
    * Equals `scd2Dim(allEvents)` by construction (per-entity
    * independence); the oracle pins exactly that.
    *
    * @param dim       the current dimension (scd2Dim output shape)
    * @param allEvents EVERY event — prior AND late — for at least the
    *                  affected entities (extra entities are ignored by
    *                  the semi-join)
    * @param late      the late event batch (user_id, ts, event_id,
    *                  event_type)
    */
  def scd2ApplyLate(dim: DataFrame, allEvents: DataFrame,
                    late: DataFrame): DataFrame = {
    val affected = late.select(col("user_id")).distinct()
    val rebuilt = scd2Dim(allEvents.join(affected, Seq("user_id"), "left_semi"))
    dim.join(affected, Seq("user_id"), "left_anti").unionByName(rebuilt)
  }
}
