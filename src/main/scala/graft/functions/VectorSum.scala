package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of `array<double>` vectors in one mutable primitive
  * buffer (SURVEY.md §4.3 ladder, the [[MinHashSignature]] rung).
  *
  * The expression formulation of a distributed vector mean —
  * `posexplode` → `groupBy(key, pos).agg(avg)` — shuffles n·dim rows
  * (the Lloyd-step shape Ivf used through r9: at 10⁶ vectors × 64 dims
  * that is 6.4·10⁷ shuffle rows PER TRAINING ROUND). This aggregate
  * sums map-side into one `Array[Double]` per group per partition, so
  * the shuffle moves only |groups|·|partitions| partial buffers — the
  * standard partial-aggregation win, extended to vector state.
  *
  * Dimension is taken from the first non-null input; a later input of a
  * different length is a data error and fails loudly. Groups with no
  * non-null input evaluate to null.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  // Empty array = "no input seen yet" (dim unknown until the first row);
  // null inputs are skipped like every SQL aggregate.
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buffer.length == 0) new Array[Double](n) else buffer
      require(b.length == n,
        s"vec_sum: inconsistent vector lengths (${b.length} vs $n)")
      var i = 0
      while (i < n) { b(i) += arr.getDouble(i); i += 1 }
      b
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b2.length == 0) b1
    else if (b1.length == 0) b2
    else {
      require(b1.length == b2.length,
        s"vec_sum: inconsistent vector lengths (${b1.length} vs ${b2.length})")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(storageFormat)
    Array.fill(storageFormat.length / 8)(bb.getDouble)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
}

object VectorSum {
  /** Register `vec_sum(array<double>)` in the session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sum", exprs => VectorSum(exprs.head), "scala_udf")
}
