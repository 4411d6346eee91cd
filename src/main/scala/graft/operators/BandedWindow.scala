package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Band-parallel rewrite of a value-RANGE window frame.
  *
  * `count/sum/min/max OVER (PARTITION BY p ORDER BY v RANGE BETWEEN width
  * PRECEDING AND CURRENT ROW)` serializes per partition value: Spark's
  * WindowExec walks each partition in ONE task, so a 5-segment column is
  * a 5-way parallelism ceiling no matter the cluster — at 100× each
  * segment is a single-task O(n) walk (the exact ceiling PERF.md flagged
  * for `win_range_frame`).
  *
  * The rewrite cuts `v` into bands of exactly the frame width. A row's
  * frame `[v-width, v]` then touches AT MOST two bands — its own and the
  * previous one — so the frame aggregate decomposes into band-local terms:
  *
  *   frame(v) = {u in band(v):   u <= v}          — intra-band running agg
  *            ⊕ {u in band(v)-1: u >= v-width}    — previous band's frame slice
  *
  * Term 1 is an intra-band RANGE window (ties all see each other,
  * preserving RANGE tie semantics). Term 2 is read off ONE DESCENDING
  * window pass over real rows + PHANTOM PROBE rows (one per row, deduped
  * to one per distinct value inside the same pass, placed at `v-width`):
  * with probes ordered AFTER real ties, every running aggregate over
  * preceding rows at the probe is the SUFFIX `u >= edge` inclusive — the
  * frame's lower-edge rule — for count and sum exactly as for min/max
  * and the struct-valued first/last. (Through r9 count/sum instead took
  * an ASCENDING pass — band total minus strict prefix, the invertible-
  * aggregate identity — plus a whole-partition totals walk; the suffix
  * reads the same slice DIRECTLY, so the r10 fuse deletes both extra
  * walks and every aggregate family shares one sort + one WindowExec —
  * the SweepBandedStats-measured second walk that made first+last ~2×
  * the single-aggregate cost at 100×.)
  *
  * The probe results join back on `(part, band, v)`, which the planner
  * co-locates with the term-1 window's `(part, band)` hash partitioning —
  * no extra shuffle for the join. Parallelism becomes #partitions ×
  * #bands instead of #partitions; no task ever walks more than ~two
  * bands of rows.
  *
  * Band arithmetic runs in DECIMAL/scaled longs — never double — so band
  * assignment is exact up to the scaled-long range (|v|·10^scale < 2^63;
  * a double `floor(v/width)` can round across an integer boundary and
  * misplace a row by a WHOLE band). Inputs are limited to values with
  * <= `scale` meaningful decimals (default 2, the money domain). The
  * `v-width` frame EDGE, by contrast, is deliberately compared in IEEE
  * double — see the probe comment below — which bounds EXACT edge
  * membership to |v|·10^scale < 2^53 (r6 advice): past that, adjacent
  * decimals on the 10^-scale grid collide to one double and a row
  * sitting exactly on a frame edge can land on either side — the same
  * ambiguity a direct double RANGE frame (Spark or DuckDB) has at that
  * magnitude, which is exactly what replicating the double arithmetic
  * preserves. Within 2^53 both bounds agree and the rewrite is exact.
  *
  * Beyond count/sum (invertible) and min/max (non-invertible), the same
  * two-term decomposition carries ANY merge-able aggregate: avg derives
  * from the count/sum pair, and first/last-by-order (min_by/max_by with
  * payload tiebreak) ride the descending suffix pass as struct-valued
  * min/max — ⊕ is struct `least`/`greatest`.
  */
object BandedWindow {

  /** `df` plus `cntName`/`sumName`: the count of rows and sum of
    * `valueCol` (as DECIMAL(18,2)) over the per-`part` RANGE frame
    * `[v - width, v]` (both edges inclusive — Spark's
    * `rangeBetween(-width, 0)`).
    */
  def rangeCountSum(df: DataFrame, part: Seq[String], valueCol: String,
                    width: Long, cntName: String, sumName: String): DataFrame =
    rangeFrame(df, part, valueCol, width,
      cntName = Some(cntName), sumName = Some(sumName))

  /** General banded RANGE frame: any subset of count/sum/min/max/avg of
    * `valueCol` (as DECIMAL(18,scale)) over the per-`part` frame
    * `[v - width, v]`, each emitted under the given output name, plus
    * first/last-by-order: `firstName`/`lastName` give (output, payload
    * column) pairs emitting the payload of the frame's lowest/highest
    * (v, payload) struct — min_by/max_by with deterministic payload
    * tiebreak, i.e. `min(struct(v, payload)) OVER frame` in the direct
    * formulation.
    */
  def rangeFrame(df: DataFrame, part: Seq[String], valueCol: String,
                 width: Long,
                 cntName: Option[String] = None,
                 sumName: Option[String] = None,
                 minName: Option[String] = None,
                 maxName: Option[String] = None,
                 avgName: Option[String] = None,
                 firstName: Option[(String, String)] = None,
                 lastName: Option[(String, String)] = None,
                 scale: Int = 2): DataFrame = {
    require(width > 0, "frame width must be positive")
    require(scale >= 0 && scale <= 9, "scale must be in [0, 9]")
    val outs = Seq(cntName, sumName, minName, maxName, avgName,
      firstName.map(_._1), lastName.map(_._1)).flatten
    require(outs.nonEmpty, "at least one aggregate output required")
    // Colliding output names silently overwrite each other in the
    // withColumn chain (the caller reads avg where it asked for count);
    // an output naming an input column replaces that column in the
    // passthrough projection. Both are mistakes — fail loud.
    require(outs.distinct.size == outs.size,
      s"duplicate aggregate output names: ${outs.mkString(", ")}")
    outs.foreach(n => require(!df.columns.contains(n),
      s"aggregate output '$n' collides with an input column"))
    val partCols = part.map(col)
    val money = org.apache.spark.sql.types.DecimalType(18, scale)
    var factor = 1L; (0 until scale).foreach(_ => factor *= 10L)
    val wCents = width * factor
    // avg = merged sum / merged count, so it pulls in both pipelines
    val needCnt = cntName.isDefined || avgName.isDefined
    val needSum = sumName.isDefined || avgName.isDefined
    // payload columns the first/last structs carry through the passes.
    // A payload naming a partition column would be selected twice in the
    // probes/reals projections and die later as an opaque ambiguous-
    // reference AnalysisException — reject it up front (it would also be
    // constant over the frame, so the call is a mistake by construction);
    // "__" collides with the rewrite's internal columns.
    val payloadCols = (firstName.map(_._2).toSeq ++ lastName.map(_._2)).distinct
    payloadCols.foreach { c =>
      require(!part.contains(c),
        s"first/last payload '$c' is a partition column (constant per frame)")
      require(!c.startsWith("__"), s"first/last payload '$c' shadows internal columns")
    }

    // NULL ordering values form their own RANGE peer group (a direct
    // `ORDER BY v RANGE …` frames every NULL row over exactly the
    // partition's other NULL rows) — they can't enter the band machinery
    // (a NULL band would silently drop them at the probe join), so they
    // take a dedicated partition-local window and union back at the end.
    // Statically non-nullable inputs skip the branch entirely; nullable
    // parquet columns keep it, where the pushed IsNull filter lets
    // row-group null counts skip all data when no NULLs exist.
    val valueNullable = df.schema(df.schema.fieldIndex(valueCol)).nullable
    val nullRows = df.filter(col(valueCol).isNull)
    val nonNull = if (valueNullable) df.filter(col(valueCol).isNotNull) else df

    // exact band id from integer cents: floor division via pmod so
    // negative values land in the right band too. Column./ is a DOUBLE
    // divide (exact only below 2^53) — divide in decimal instead.
    val base = nonNull
      .withColumn("__v", col(valueCol).cast(money))
      .withColumn("__band", {
        val cents = (col("__v") * factor).cast("long")
        ((cents - pmod(cents, lit(wCents)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)) / wCents)
          .cast("long")
      })

    // term 1 — intra-band running aggregates; RANGE (not ROWS) so equal
    // values each include all their ties, matching the original frame
    val wA = Window.partitionBy(partCols :+ col("__band"): _*)
      .orderBy(col("__v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)

    // term 2 — the previous band's frame slice, read off window passes
    // over real rows + phantom probes.
    //
    // The probe's SORT key is IEEE double on purpose: a direct
    // `ORDER BY v RANGE -width` over a double column (Spark's WindowExec
    // and the DuckDB oracle alike) computes the lower edge as double
    // `v - width`, and for an exact-boundary row (u == v-width in
    // decimal) the rounding residues of u and v can differ — the double
    // frame may include or exclude it either way. Replicating the double
    // arithmetic keeps the rewrite BIT-identical to the direct
    // formulation. The aggregated value stays decimal (__sv).
    // probes are NOT pre-distinct'd (that would cost a full shuffle);
    // duplicates sort adjacently and the lag() filter below — same
    // WindowExec as the prefix sums — keeps only the first of each run
    val payloadType = payloadCols.map(c =>
      c -> df.schema(df.schema.fieldIndex(c)).dataType).toMap
    val probes = base.select(partCols ++ Seq(
      col("__v").as("__orig_v"),
      col("__band").as("__orig_band"),
      (col("__v").cast("double") - width).as("__sortv"),
      lit(null).cast(money).as("__sv"),
      (col("__band") - 1).as("__pband"),
      lit(0).as("__real")) ++
      payloadCols.map(c => lit(null).cast(payloadType(c)).as(c)): _*)
    val reals = base.select(partCols ++ Seq(
      lit(null).cast(money).as("__orig_v"),
      lit(null).cast("long").as("__orig_band"),
      col("__v").cast("double").as("__sortv"),
      col("__v").as("__sv"),
      col("__band").as("__pband"),
      lit(1).as("__real")) ++
      payloadCols.map(col): _*)
    // THE descending pass (every aggregate family shares it): real ties
    // BEFORE the probe → each running aggregate over preceding rows at
    // the probe is the suffix `u >= edge`, inclusive, matching the
    // frame's lower edge directly — count/sum as much as min/max (the
    // suffix IS the prev-band frame slice; no total-minus-prefix needed).
    // __orig_v as tertiary key (r5 advice): two DISTINCT decimal values
    // can collide to the same double __sortv past ~2^53/10^scale, and
    // without it equal-(sortv, real) probes interleave nondeterministic-
    // ally — an (A,B,A,B) run defeats the lag() dedup below and fans the
    // probe join out into duplicate rows. Reals carry a NULL __orig_v
    // and are already separated from probes by the __real key, so the
    // real-ties-before-probe semantics are untouched.
    val wOrd = Window.partitionBy(partCols :+ col("__pband"): _*)
      .orderBy(col("__sortv").desc, col("__real").desc, col("__orig_v").desc)
    val wD = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // struct-valued order key for first/last: probes contribute NULL (the
    // aggregate skips them); reals contribute (v, payload), compared
    // field-by-field — exactly `min/max(struct(v, payload))` semantics
    def obStruct(payload: String): Column =
      when(col("__real") === 1,
        struct(col("__sv").as("v"), col(payload).as("p")))
    // each suffix aggregate guarded on its own output (r5 advice: a
    // single-aggregate caller shouldn't pay unused WindowExec buffers)
    var prev = reals.unionByName(probes)
    if (needCnt) prev = prev
      .withColumn("__ge_cnt",
        sum(when(col("__real") === 1, 1L).otherwise(0L)).over(wD))
    if (needSum) prev = prev
      .withColumn("__ge_sum", sum(col("__sv")).over(wD))
    if (minName.isDefined) prev = prev
      .withColumn("__ge_min", min(col("__sv")).over(wD))
    if (maxName.isDefined) prev = prev
      .withColumn("__ge_max", max(col("__sv")).over(wD))
    if (firstName.isDefined) prev = prev
      .withColumn("__ge_fb", min(obStruct(firstName.get._2)).over(wD))
    if (lastName.isDefined) prev = prev
      .withColumn("__ge_lb", max(obStruct(lastName.get._2)).over(wD))
    // duplicate probes (same value appearing on several rows) sort as a
    // run: equal __sortv, __real=0, reals before. Keep the run's first —
    // lag() shares wOrd's WindowExec, so this dedup is shuffle-free.
    val probeOut = partCols ++ Seq(
      col("__orig_band").as("__band"),
      col("__orig_v").as("__v")) ++
      (if (needCnt) Seq(col("__ge_cnt").as("__prev_cnt")) else Nil) ++
      (if (needSum) Seq(
        // an empty suffix (no real row at/above the edge) sums to NULL;
        // the merge below ADDS the complements, so normalize to 0
        coalesce(col("__ge_sum"), lit(0).cast(money)).as("__prev_sum"))
       else Nil) ++
      minName.map(_ => col("__ge_min").as("__prev_min")).toSeq ++
      maxName.map(_ => col("__ge_max").as("__prev_max")).toSeq ++
      firstName.map(_ => col("__ge_fb").as("__prev_fb")).toSeq ++
      lastName.map(_ => col("__ge_lb").as("__prev_lb")).toSeq
    val prevSlice = prev
      .withColumn("__prev_probe_v", lag(col("__orig_v"), 1).over(wOrd))
      .filter(col("__real") === 0 && !(col("__prev_probe_v") <=> col("__orig_v")))
      .select(probeOut: _*)

    // join keys include (part, __band) so the planner co-locates on the
    // windows' existing hash partitioning instead of reshuffling by value
    var joined = base
    if (needCnt) joined = joined.withColumn("__a_cnt", count(lit(1)).over(wA))
    if (needSum) joined = joined.withColumn("__a_sum", sum(col("__v")).over(wA))
    if (minName.isDefined) joined = joined.withColumn("__a_min", min(col("__v")).over(wA))
    if (maxName.isDefined) joined = joined.withColumn("__a_max", max(col("__v")).over(wA))
    if (firstName.isDefined) joined = joined.withColumn("__a_fb",
      min(struct(col("__v").as("v"), col(firstName.get._2).as("p"))).over(wA))
    if (lastName.isDefined) joined = joined.withColumn("__a_lb",
      max(struct(col("__v").as("v"), col(lastName.get._2).as("p"))).over(wA))
    joined = joined.join(prevSlice, part ++ Seq("__band", "__v"))
    // combine: count/sum add the complements; min/max (and the struct-
    // valued first/last) merge with null-skipping least/greatest (term 1
    // is never empty — the frame always contains the current row — so
    // the result is never null). avg replicates Spark's decimal Average
    // expression shape — Divide(sum: dec(28,s), count: dec(20,0)) cast
    // to dec(22, s+4) — so the banded result rounds bit-identically to
    // the direct formulation (a different intermediate division scale
    // could double-round half-ulp cases the other way).
    import org.apache.spark.sql.types.DecimalType
    val avgType = DecimalType(22, scale + 4)
    val sumType = DecimalType(28, scale)
    val cntType = DecimalType(20, 0)
    val outCols: Seq[(String, Column)] =
      cntName.map(n => n -> (col("__a_cnt") + col("__prev_cnt"))).toSeq ++
      sumName.map(n => n -> (col("__a_sum") + col("__prev_sum"))) ++
      minName.map(n => n -> least(col("__a_min"), col("__prev_min"))) ++
      maxName.map(n => n -> greatest(col("__a_max"), col("__prev_max"))) ++
      avgName.map(n => n -> ((col("__a_sum") + col("__prev_sum")).cast(sumType)
        / (col("__a_cnt") + col("__prev_cnt")).cast(cntType)).cast(avgType)) ++
      firstName.map { case (n, _) =>
        n -> least(col("__a_fb"), col("__prev_fb")).getField("p") } ++
      lastName.map { case (n, _) =>
        n -> greatest(col("__a_lb"), col("__prev_lb")).getField("p") }
    for ((n, c) <- outCols) joined = joined.withColumn(n, c)
    val banded =
      joined.select(df.columns.map(col) ++ outCols.map { case (n, _) => col(n) }: _*)

    // null peer group: count = the partition's null-row count; sum/min/
    // max over an all-NULL set are NULL. Output types are cast to the
    // banded side's exact types so the union stays schema-identical.
    val wPeers = Window.partitionBy(partCols: _*)
    val typeOf = banded.schema.fields.map(f => f.name -> f.dataType).toMap
    // first/last over the all-NULL peer group still return a payload:
    // the direct min/max(struct(v, p)) compares equal NULL v fields and
    // falls through to the payload tiebreak — replicate it exactly.
    val nullOut: Seq[Column] =
      cntName.map(n => count(lit(1)).over(wPeers).cast(typeOf(n)).as(n)).toSeq ++
      sumName.map(n => lit(null).cast(typeOf(n)).as(n)) ++
      minName.map(n => lit(null).cast(typeOf(n)).as(n)) ++
      maxName.map(n => lit(null).cast(typeOf(n)).as(n)) ++
      avgName.map(n => lit(null).cast(typeOf(n)).as(n)) ++
      firstName.map { case (n, p) =>
        min(struct(col(valueCol).cast(money).as("v"), col(p).as("p")))
          .over(wPeers).getField("p").as(n) } ++
      lastName.map { case (n, p) =>
        max(struct(col(valueCol).cast(money).as("v"), col(p).as("p")))
          .over(wPeers).getField("p").as(n) }
    if (!valueNullable) banded
    else banded.unionByName(
      nullRows.select(df.columns.map(col).toIndexedSeq ++ nullOut: _*))
  }
}
