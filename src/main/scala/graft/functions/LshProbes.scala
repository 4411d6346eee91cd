package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression computing every LSH table's probe buckets
  * in ONE fused pass over the embedding (SURVEY.md §4.3 preference:
  * custom `Expression` with `doGenCode` over declarative HOF trees).
  *
  * The Column formulation in [[graft.operators.Ann]] builds tables ×
  * planes separate `aggregate(zip_with(...))` trees — higher-order
  * functions are CodegenFallback, so a 16×6 configuration interprets 96
  * lambda folds per row with per-element allocation. This expression
  * generates one primitive loop nest: dim-length dot products per plane,
  * sign-bit bucket assembly, margin selection, and probe emission, all
  * inside whole-stage codegen.
  *
  * Output: `array<array<long>>` — element `t` holds table t's probe
  * buckets: the base bucket, then (if `nprobe > 0`) the buckets with the
  * r-th-smallest-|margin| plane bit flipped for r < min(nprobe, planes),
  * then (if `nprobe >= 2` and planes >= 2) the Hamming-2 pair flip of
  * the two nearest planes — byte-identical ordering and tie semantics
  * (|margin| ties break by plane index, matching the Column form's
  * `sort_array` of `(abs, j)` structs).
  *
  * Numerics: each projection folds left-to-right in double, exactly like
  * the `aggregate` fold it replaces, so bucket ids are bit-identical.
  */
case class LshProbes(child: Expression, planes: Seq[Seq[Seq[Double]]],
                     nprobe: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_probes expects array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  private val numTables = planes.length
  private val planesPerTable = planes.head.length
  private val dim = planes.head.head.length
  private val singles = math.min(nprobe, planesPerTable)
  private val hasPair = nprobe >= 2 && planesPerTable >= 2
  private val probesPerTable = 1 + singles + (if (hasPair) 1 else 0)

  /** tables × planes row-major plane matrix, flat for cheap JVM access. */
  @transient private lazy val flat: Array[Array[Double]] =
    planes.flatMap(_.map(_.toArray)).toArray

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    // Per-row validation, ONCE before the table loop (not per plane):
    // checkDim's head-probe only sees the first row, so a ragged or
    // null-element row must fail LOUD here — an unclamped getDouble past
    // numElements reads adjacent row memory (silently wrong buckets),
    // and a null element decodes as 0.0 (a legitimate-looking wrong
    // bucket). Cost: dim null-bit checks per row, amortized over
    // tables × planes × dim multiply-adds.
    require(e.numElements() == dim,
      s"lsh_probes: embedding has ${e.numElements()} elements, expected $dim")
    var v = 0
    while (v < dim) {
      require(!e.isNullAt(v), s"lsh_probes: null element at index $v")
      v += 1
    }
    val out = new Array[ArrayData](numTables)
    val proj = new Array[Double](planesPerTable)
    var t = 0
    while (t < numTables) {
      var j = 0
      while (j < planesPerTable) {
        val p = flat(t * planesPerTable + j)
        var d = 0.0
        var i = 0
        while (i < dim) { d += e.getDouble(i) * p(i); i += 1 }
        proj(j) = d
        j += 1
      }
      out(t) = new GenericArrayData(probesFor(proj))
      t += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  /** Probe list for one table given its projections — shared by the
    * interpreted and generated paths' semantics (the generated code
    * mirrors this exactly).
    */
  private def probesFor(proj: Array[Double]): Array[Long] = {
    var bucket = 0L
    var j = 0
    while (j < planesPerTable) {
      if (proj(j) >= 0) bucket |= (1L << j)
      j += 1
    }
    val probes = new Array[Long](probesPerTable)
    probes(0) = bucket
    if (singles > 0) {
      // selection of the `singles` smallest |proj| indices; ties break
      // by plane index because strict `<` keeps the earlier candidate
      val used = new Array[Boolean](planesPerTable)
      var first = -1; var second = -1
      var r = 0
      while (r < singles) {
        var best = -1
        var k = 0
        while (k < planesPerTable) {
          // Double.compare, not `<`: NaN must rank LAST (greater than
          // every double), matching Spark's sort_array ordering in the
          // Column formulation this expression replaces — a strict `<`
          // would keep an incumbent NaN forever and probe the NaN plane
          if (!used(k) && (best < 0 ||
              java.lang.Double.compare(math.abs(proj(k)), math.abs(proj(best))) < 0))
            best = k
          k += 1
        }
        used(best) = true
        if (r == 0) first = best else if (r == 1) second = best
        probes(1 + r) = bucket ^ (1L << best)
        r += 1
      }
      // hasPair implies planesPerTable >= 2 and nprobe >= 2, so both
      // first and second are always assigned above
      if (hasPair)
        probes(1 + singles) = bucket ^ (1L << first) ^ (1L << second)
    }
    probes
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression instance itself is the reference: the generated code
    // calls back into probesFor after a generated primitive projection
    // loop would duplicate the selection logic — instead ship the plane
    // matrix and run the whole per-row computation in one compiled
    // method (JIT-compiled Scala, invoked from generated code; no
    // per-element lambda interpretation, no Catalyst tree walking)
    val self = ctx.addReferenceObj("lshProbes", this, classOf[LshProbes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshProbes =
    copy(child = newChild)

  override def prettyName: String = "lsh_probes"
}
