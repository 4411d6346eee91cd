package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression computing a vector's `nprobe` nearest IVF
  * cells in ONE fused compiled pass — the third instance of the
  * HOF-fusion lever ([[LshProbes]], [[PqEncode]]).
  *
  * The DataFrame formulation in [[graft.operators.Ivf]] was
  * `crossJoin(broadcast(cents))` + `row_number` over a `vec_id` window:
  * an nlist× row blow-up plus a full shuffle of the corpus on vec_id,
  * paid on EVERY Lloyd step and every IVF / IVF-PQ index build — most of
  * sim_ivf_pq's 100× build cost (r6 verdict #1). This expression scores
  * all centroids and selects the probe cells per row, inside whole-stage
  * codegen, with no join and no shuffle.
  *
  * Output: `array<long>` of min(nprobe, ncells) cell ids ordered exactly
  * like the window form's `row_number over (sim desc, cell asc)`:
  *  - similarity is [[CosineSimilarity]]'s formula with its association
  *    order — dot and both norms folded left-to-right in double, sim =
  *    dot / (sqrt(|e|²)·sqrt(|c|²)) — so scores are bit-identical to the
  *    crossJoin form (centroid norms are precomputed once per expression;
  *    each is the same left-to-right fold the binary expression runs);
  *  - ordering uses `java.lang.Double.compare` descending, so NaN ranks
  *    FIRST (Spark's descending double sort puts NaN above every value —
  *    a zero-norm vector probes deterministically, not arbitrarily);
  *  - ties keep the smallest cell id (centroids are sorted by cell id at
  *    construction and selection keeps the earlier candidate on compare
  *    == 0, mirroring the `cell asc` tiebreak).
  *
  * Deviations from the window form, both fail-loud by convention:
  * a dimension mismatch throws (the crossJoin form's min-length fold
  * silently truncated), and a NULL embedding yields a NULL probe list
  * (the window form assigned the lowest cell id to all-null sims) — a
  * null cell drops from downstream equi-joins visibly.
  *
  * Two carriers for the centroid table, one kernel ([[NearestCells.eval]]
  * — shared code IS the bit-identity proof between them):
  *  - [[NearestCells]] embeds the table as constructor literals — exact,
  *    spec-friendly, but the table rides every serialized task binding
  *    and is re-sorted per task, so it only scales to fixture nlist;
  *  - [[NearestCellsBc]] resolves the prebuilt table from a broadcast
  *    variable executor-side (torrent-fetched once per executor, shared
  *    across its tasks) — the 100-TB carrier once nlist scales with the
  *    corpus ([[graft.operators.EmbedDedup]]'s autoNlist dial).
  */
case class NearestCells(child: Expression, cells: Seq[Long],
                        centroids: Seq[Seq[Double]], nprobe: Int)
    extends UnaryExpression {

  require(cells.nonEmpty && cells.length == centroids.length,
    s"nearest_cells: ${cells.length} cell ids for ${centroids.length} centroids")
  require(nprobe >= 1, s"nearest_cells: nprobe must be >= 1, got $nprobe")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val table: NearestCells.Cents =
    NearestCells.cents(cells, centroids)

  override def nullSafeEval(input: Any): Any =
    NearestCells.eval(input.asInstanceOf[ArrayData], table, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Ship the expression itself and run the whole per-row computation in
    // one JIT-compiled method (the LshProbes/PqEncode codegen seam): no
    // per-element lambda interpretation, no Catalyst tree walking.
    val self = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}

/** [[NearestCells]] over a BROADCAST centroid table — same kernel, so
  * the assignment is identical by construction (spec-gated anyway in
  * PlanSpec); only the transport differs. The expression serializes as a
  * broadcast handle (~bytes), not the table: at nlist ≈ 10⁶ × dim 64 the
  * literal form ships ~500 MB inside EVERY task binding and re-sorts it
  * per task, while this form torrent-fetches the prebuilt table once per
  * executor. `prettyName` keeps a distinct name so `.explain` shows which
  * carrier a plan compiled.
  */
case class NearestCellsBc(child: Expression,
                          bc: Broadcast[NearestCells.Cents], nprobe: Int)
    extends UnaryExpression {

  require(nprobe >= 1, s"nearest_cells_bc: nprobe must be >= 1, got $nprobe")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells_bc expects array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NearestCells.eval(input.asInstanceOf[ArrayData], bc.value, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCellsBc", this, classOf[NearestCellsBc].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsBc =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells_bc"
}

object NearestCells {
  /** Cell-id-sorted centroid table: ids, flat matrix, per-centroid
    * squared norms (each the left-to-right fold [[CosineSimilarity]]
    * would run). Built ONCE — driver-side for the broadcast carrier,
    * lazily per task for the literal carrier.
    */
  final case class Cents(ids: Array[Long], mat: Array[Array[Double]],
                         sqNorms: Array[Double]) {
    def ncells: Int = ids.length
    def dim: Int = mat.head.length
  }

  def cents(cells: Seq[Long], centroids: Seq[Seq[Double]]): Cents = {
    require(cells.nonEmpty && cells.length == centroids.length,
      s"nearest_cells: ${cells.length} cell ids for ${centroids.length} centroids")
    val sorted = cells.zip(centroids).sortBy(_._1)
    val i = sorted.map(_._1).toArray
    val m = sorted.map(_._2.toArray).toArray
    val n = m.map { c =>
      var s = 0.0; var k = 0
      while (k < c.length) { s += c(k) * c(k); k += 1 }
      s
    }
    Cents(i, m, n)
  }

  /** The shared per-row kernel (both carriers call exactly this). */
  private[functions] def eval(e: ArrayData, t: Cents, nprobe: Int): Any = {
    val dim = t.dim
    val ncells = t.ncells
    val probes = math.min(nprobe, ncells)
    // Per-row validation, once (the LshProbes convention): an unclamped
    // getDouble past numElements reads adjacent row memory and a null
    // element decodes as 0.0 — both silently-wrong cells.
    require(e.numElements() == dim,
      s"nearest_cells: embedding has ${e.numElements()} elements, expected $dim")
    var v = 0
    var en = 0.0
    while (v < dim) {
      require(!e.isNullAt(v), s"nearest_cells: null element at index $v")
      val x = e.getDouble(v)
      en += x * x
      v += 1
    }
    val sims = new Array[Double](ncells)
    var c = 0
    while (c < ncells) {
      val cent = t.mat(c)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += e.getDouble(i) * cent(i); i += 1 }
      sims(c) = dot / (math.sqrt(en) * math.sqrt(t.sqNorms(c)))
      c += 1
    }
    val out = new Array[Long](probes)
    val used = new Array[Boolean](ncells)
    var r = 0
    while (r < probes) {
      var best = -1
      var k = 0
      while (k < ncells) {
        // Double.compare descending: NaN ranks above every value, and a
        // strict > keeps the earlier (smaller cell id) on exact ties —
        // byte-identical to row_number over (sim desc, cell asc)
        if (!used(k) && (best < 0 ||
            java.lang.Double.compare(sims(k), sims(best)) > 0))
          best = k
        k += 1
      }
      used(best) = true
      out(r) = t.ids(best)
      r += 1
    }
    new GenericArrayData(out)
  }
}
