package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** PQ encode: embedding → m nearest-subspace-centroid codes, one fused
  * compiled pass (the [[LshProbes]] pattern — HOF trees would interpret
  * m × ksub distance folds per row). Ties keep the lowest code.
  *
  * Output is BINARY — one unsigned byte per subspace (ksub ≤ 256
  * enforced), so the claimed m-bytes-per-vector footprint is what
  * actually ships through scans and shuffles; an array<int> would
  * quietly cost 4× plus per-element overhead.
  */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.forall(_.length <= 256),
    "pq_encode: ksub > 256 does not fit the one-byte-per-code layout")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType

  private val m = codebooks.length
  private val dsub = codebooks.head.head.length
  private val dim = m * dsub

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    require(e.numElements() == dim,
      s"pq_encode: embedding has ${e.numElements()} elements, expected $dim")
    var v = 0
    while (v < dim) {
      require(!e.isNullAt(v), s"pq_encode: null element at index $v")
      v += 1
    }
    val code = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cents = codebooks(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val t = e.getDouble(j * dsub + i) - cents(c)(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code(j) = (best & 0xff).toByte
      j += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (byte[]) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** Asymmetric PQ distance: squared L2 between a full-precision query and
  * a code's per-subspace centroids, summed — ascending order ranks like
  * descending cosine on L2-normalized inputs.
  *
  * Scoring uses the classic per-query ADC LOOKUP TABLE (r7, r6 verdict
  * #3): the first candidate a query meets in a task computes the m×ksub
  * table of subspace distances once (`lut(j)(c)` = ‖q_j − cb(j)(c)‖²),
  * and every further candidate costs m byte-indexed lookups + adds
  * instead of dim multiply-subtract-adds. The memo is per-task (a
  * ThreadLocal bounded map keyed on query content — tasks deserialize
  * their own expression instance, the ThreadLocal guards the shared-JVM
  * local-mode edge), so the table amortizes across the candidate stream
  * without driver coordination.
  *
  * Distance definition: per-subspace partials summed in subspace order —
  * the LUT decomposition. (r6 folded one global accumulator across all
  * dim terms; the two differ only in floating-point association order,
  * below the 5-dp rounding every consumer applies. The LUT and direct
  * per-subspace forms are bit-identical, spec-gated.)
  */
case class PqAdc(left: Expression, right: Expression,
                 codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<double>, binary), got " +
          s"${l.simpleString} / ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  private val m = codebooks.length
  private val dsub = codebooks.head.head.length
  private val dim = m * dsub

  /** Per-task LUT memo: query-content-hash → (query copy, m×ksub table).
    * Bounded (clear-all past 256 entries ≈ 8 MB at the shipped dial) —
    * query sets are small and batched, a miss just recomputes. A
    * same-hash different-content collision is caught by the equals check
    * and overwritten.
    */
  @transient private lazy val lutCache:
      ThreadLocal[java.util.HashMap[Integer, (Array[Double], Array[Array[Double]])]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[Integer, (Array[Double], Array[Array[Double]])]())

  private def lutFor(qe: ArrayData): Array[Array[Double]] = {
    // extraction doubles as validation (the LshProbes convention): length
    // AND element nulls fail loud — a null query element would decode as
    // 0.0 and produce a plausible but wrong distance.
    require(qe.numElements() == dim,
      s"pq_adc: query has ${qe.numElements()} elements, expected $dim")
    val q = new Array[Double](dim)
    var v = 0
    while (v < dim) {
      require(!qe.isNullAt(v), s"pq_adc: null query element at index $v")
      q(v) = qe.getDouble(v)
      v += 1
    }
    val cache = lutCache.get()
    val h = Integer.valueOf(java.util.Arrays.hashCode(q))
    val hit = cache.get(h)
    if (hit != null && java.util.Arrays.equals(hit._1, q)) return hit._2
    val lut = new Array[Array[Double]](m)
    var j = 0
    while (j < m) {
      val cents = codebooks(j)
      val row = new Array[Double](cents.length)
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val t = q(j * dsub + i) - cent(i)
          d += t * t
          i += 1
        }
        row(c) = d
        c += 1
      }
      lut(j) = row
      j += 1
    }
    if (cache.size >= 256) cache.clear()
    cache.put(h, (q, lut))
    lut
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val qe = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[Array[Byte]]
    require(code.length == m,
      s"pq_adc: code has ${code.length} entries, expected $m")
    val lut = lutFor(qe)
    // the code side has no element nulls by construction (BINARY)
    var d = 0.0
    var j = 0
    while (j < m) {
      val ci = code(j) & 0xff
      require(ci < codebooks(j).length,
        s"pq_adc: code $ci out of range for subspace $j (ksub=${codebooks(j).length})")
      d += lut(j)(ci)
      j += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = (double)(Double) $self.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}
