package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom imperative aggregate (SURVEY.md §4.3 ladder, rung b→c): the
  * whole MinHash signature — elementwise min over `numHashes`
  * permutations — in ONE mutable `Array[Long]` buffer.
  *
  * The expression formulation (64 separate `min(pmod(h*a+b, p))` slots)
  * is correct but pays 64 aggregate-slot updates with full expression
  * evaluation per row; this aggregate runs a tight primitive loop per
  * input and merges buffers elementwise — the standard
  * `TypedImperativeAggregate` trade (opaque binary state, imperative
  * update) that §4.3 reserved for exactly this kind of sketch.
  *
  * Input: a 64-bit hashed shingle (LongType), e.g. `xxhash64(shingle)`.
  * Output: array<long> of length `numHashes` — identical values to the
  * expression formulation (same 32-bit truncation, same `(a·h+b) mod p`
  * with the shared 31-bit Mersenne modulus; verified by MinHashSpec).
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int = 64,
    seed: Long = 42L,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // ONE shared modulus with the operator/streaming paths — signatures
  // must stay bit-identical across the three formulations (see
  // MinHash.Prime for the round-15 wrap-starvation root cause)
  private val Prime = graft.operators.MinHash.Prime
  private val Mask = 0xFFFFFFFFL

  // Same coefficient stream as graft.operators.MinHash.coeffs.
  @transient private lazy val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)(
      (rnd.nextInt(Int.MaxValue).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & Mask
      var i = 0
      while (i < numHashes) {
        val (a, b) = coeffs(i)
        val p = (a * h + b) % Prime // a·h ≤ (2^31−1)·(2^32−1) < 2^63: no overflow
        if (p < buffer(i)) buffer(i) = p
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(storageFormat)
    Array.fill(numHashes)(bb.getLong)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a bigint (pre-hashed shingle), got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
}

object MinHashSignature {
  /** Register `minhash_sig(hashed_shingle)` in the session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession,
               numHashes: Int = 64, seed: Long = 42L): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSignature(exprs.head, numHashes, seed),
      "scala_udf")
}
