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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val qe = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[Array[Byte]]
    // per-row validation (the LshProbes convention): length AND element
    // nulls fail loud — a null query element would decode as 0.0 and
    // produce a plausible but wrong distance. The binary code side has
    // no element nulls by construction.
    require(qe.numElements() == dim,
      s"pq_adc: query has ${qe.numElements()} elements, expected $dim")
    var v = 0
    while (v < dim) {
      require(!qe.isNullAt(v), s"pq_adc: null query element at index $v")
      v += 1
    }
    require(code.length == m,
      s"pq_adc: code has ${code.length} entries, expected $m")
    var d = 0.0
    var j = 0
    while (j < m) {
      val ci = code(j) & 0xff
      require(ci < codebooks(j).length,
        s"pq_adc: code $ci out of range for subspace $j (ksub=${codebooks(j).length})")
      val cent = codebooks(j)(ci)
      var i = 0
      while (i < dsub) {
        val t = qe.getDouble(j * dsub + i) - cent(i)
        d += t * t
        i += 1
      }
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
