package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native L2 unit-normalization of a double array — one fused compiled
  * pass (the [[LshProbes]]/[[PqEncode]] lever, fourth instance).
  *
  * The Column formulation (`sqrt(aggregate(transform(e, x*x), ...))` then
  * `transform(e, _ / nrm)`) is a CodegenFallback HOF chain interpreted
  * per element — and because [[graft.operators.Pq]] index builds scan the
  * corpus several times (sample init, Lloyd steps, codebook sample,
  * encode), the interpreted normalization was re-executed on EVERY scan:
  * measured as the dominant share of sim_ivf_pq's ~100 s build at 100×.
  *
  * Numerics: the squared-norm folds left-to-right from 0.0 in double and
  * each element divides by the same sqrt — bit-identical to the HOF form
  * it replaces (spec-gated on the real fixture).
  *
  * Fail-loud (r6 ADVICE): a zero or non-finite norm throws instead of
  * silently emitting Infinity/NaN elements that [[PqEncode]] would encode
  * into plausible-looking codes; null elements and a null array follow
  * the [[LshProbes]] convention (loud / null-out respectively).
  */
case class UnitNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unit_normalize expects array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      require(!e.isNullAt(i), s"unit_normalize: null element at index $i")
      val x = e.getDouble(i)
      s += x * x
      i += 1
    }
    val nrm = math.sqrt(s)
    require(nrm > 0 && !nrm.isInfinite,
      s"unit_normalize: zero or non-finite norm $nrm — an unnormalizable " +
        "vector must be filtered or fixed upstream, not silently indexed")
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = e.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unitNormalize", this, classOf[UnitNormalize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnitNormalize =
    copy(child = newChild)

  override def prettyName: String = "unit_normalize"
}

object UnitNormalize {
  /** Registry seam (Spark 4's Column hides Expression — the
    * [[CosineSimilarity]] pattern): idempotent, fixed name.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unit_normalize", exprs => UnitNormalize(exprs.head), "scala_udf")

  /** Column-API entry point (requires [[register]] in the session). */
  def apply(c: Column): Column =
    org.apache.spark.sql.functions.call_function("unit_normalize", c)
}
