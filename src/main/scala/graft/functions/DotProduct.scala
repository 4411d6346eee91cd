package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two double arrays — [[CosineSimilarity]] minus
  * the norm accumulators, for hot paths where the norms are PRECOMPUTED
  * once per row instead of re-folded per pair ([[graft.operators.
  * EmbedDedup]]'s within-cell scoring: candidate pairs are ~n·cellsize,
  * each row participates in ~cellsize pairs, so folding norms per pair
  * triples the arithmetic of the single hottest loop in the operator).
  *
  * `dot/(nrm1·nrm2)` with nrm = sqrt of the same left-to-right square
  * fold is bit-identical to [[CosineSimilarity]]'s fused result: the
  * accumulation orders match, and IEEE sqrt/multiply/divide are exact
  * functions of their operands. Length semantics mirror
  * [[CosineSimilarity]] (fold over the shorter array, DuckDB
  * `list_inner_product` parity).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Registry seam (Spark 4's Column hides Expression — the
    * [[CosineSimilarity]]/[[UnitNormalize]] pattern): idempotent, fixed name.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")

  /** Column-API entry point (requires [[register]] in the session). */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_product", a, b)
}
