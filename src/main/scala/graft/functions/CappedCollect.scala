package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Collect up to `cap + 1` long values per group into one primitive
  * buffer (SURVEY.md §4.3 ladder, the [[MinHashSignature]]/[[VectorSum]]
  * rung) — the bounded-memory building block for "drop oversized buckets
  * WHOLE" semantics in the LSH candidate join
  * ([[graft.operators.MinHash.lshCandidates]]).
  *
  * The unbounded alternative (`collect_list`) materialises a hot bucket's
  * ENTIRE membership in one aggregation-buffer row — one adversarial band
  * key (boilerplate corpora, degenerate vocabularies) turns into an
  * unbounded array on a single task. This aggregate stops appending at
  * `cap + 1` elements, so the buffer is ≤ 8·(cap+1) bytes regardless of
  * skew, and the evaluated array tells the caller everything it needs:
  *
  *   - `size ≤ cap`  → the EXACT bucket membership (no input was skipped:
  *                      appending only stops once size exceeds `cap`);
  *   - `size = cap+1` → the true bucket size exceeds `cap` — drop whole.
  *
  * Map-side partial aggregation composes: merging partials appends until
  * the cap+1 sentinel size is reached, so a bucket whose TRUE size
  * exceeds the cap always surfaces as `cap+1` even when every partial was
  * under it. Element order is partition-dependent (like `collect_list`)
  * — callers needing determinism sort the array.
  */
case class CappedLongCollect(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  require(cap > 0, s"capped_collect: cap must be positive, got $cap")

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    new scala.collection.mutable.ArrayBuffer[Long](4)

  override def update(
      buffer: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null && buffer.length <= cap) buffer += v.asInstanceOf[Long]
    buffer
  }

  override def merge(
      b1: scala.collection.mutable.ArrayBuffer[Long],
      b2: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < b2.length && b1.length <= cap) { b1 += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: scala.collection.mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(storageFormat)
    val out = new scala.collection.mutable.ArrayBuffer[Long](storageFormat.length / 8)
    var i = 0
    while (i < storageFormat.length / 8) { out += bb.getLong; i += 1 }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"capped_collect expects bigint, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongCollect =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongCollect =
    copy(inputAggBufferOffset = newOffset)
}

object CappedLongCollect {
  /** Register `capped_collect_<cap>(bigint)` in the session (idempotent;
    * the cap is baked into the name so concurrent pipelines with
    * different caps can't race one registry slot).
    */
  def register(spark: org.apache.spark.sql.SparkSession, cap: Int): String = {
    val name = s"capped_collect_$cap"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => CappedLongCollect(exprs.head, cap), "scala_udf")
    name
  }

  /** The ONE capped group→pairs shape shared by the LSH candidate join
    * ([[graft.operators.MinHash.lshCandidates]]) and substring dedup
    * ([[graft.operators.SubstringDedup.sharedGramPairs]]): group `df` by
    * `keys`, capped-collect the long `idCol` per group, DROP groups over
    * `cap` WHOLE (truncation would be partition-order-dependent), and
    * explode each surviving group's sorted membership into (d1, d2)
    * pairs map-side — one hash-aggregate shuffle, no sort, no self-join
    * anywhere (the r10 rewrite both call sites' PERF numbers depend on).
    * Pairs are NOT deduplicated here: a pair surfaces once per group it
    * shares — callers `.distinct()` (candidates) or count per pair
    * (shared-gram extent) as their semantics need.
    */
  def groupPairs(df: org.apache.spark.sql.DataFrame,
                 keys: Seq[org.apache.spark.sql.Column],
                 idCol: org.apache.spark.sql.Column,
                 cap: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val fn = register(df.sparkSession, cap)
    // size ≤ cap ⇒ EXACT membership; size = cap+1 ⇒ true size > cap
    // (drop whole). Sorting the ≤cap array makes d1 < d2 by construction.
    df.groupBy(keys: _*)
      .agg(call_function(fn, idCol).as("docs"))
      .filter(size(col("docs")).between(2, cap))
      .select(array_sort(col("docs")).as("docs"))
      .select(posexplode(col("docs")).as(Seq("i", "d1")), col("docs"))
      // partners of the element at 0-based pos i: 1-based slice i+2 …
      // end (slice clamps an oversized length; start past the end → [])
      .select(col("d1"),
        explode(slice(col("docs"), col("i") + lit(2), size(col("docs")))).as("d2"))
  }
}
