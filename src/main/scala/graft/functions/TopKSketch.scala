package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams") as a
  * [[TypedImperativeAggregate]] — the bounded-memory answer to "top
  * tokens/URLs/hosts over 100 TB" where an exact groupBy's key space is
  * unbounded but only the head matters.
  *
  * State: at most `capacity` counters (item → (count, err)). On input:
  * present → increment; spare room → insert (1, 0); full → evict a
  * minimum counter m and insert (m.count+1, m.count) — the classic
  * overestimate bound: true(x) ≤ count(x) ≤ true(x) + err(x). Merge
  * (partial aggregation / map-side combine) sums counts and errors
  * pairwise, offsets absent counters by the other side's minimum as
  * error, and truncates back to `capacity` — the standard mergeable
  * SpaceSaving (error bounds add, correctness order preserved for
  * sufficiently-frequent items).
  *
  * When `capacity` ≥ the true distinct count the sketch degenerates to
  * EXACT counting (no eviction ever fires, err = 0) — which is what
  * makes the fixture query DuckDB-oracle-checkable while the property
  * test exercises the lossy regime.
  *
  * Output: `map<string, array<bigint>>` item → [count, err] (the query
  * layer explodes and ranks it; a map keeps the aggregate's output
  * deterministic regardless of internal ordering).
  */
case class TopKSketch(
    child: Expression,
    capacity: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Array[Long]]] {

  require(capacity >= 1, s"topk_sketch capacity must be >= 1, got $capacity")

  override def createAggregationBuffer(): mutable.HashMap[String, Array[Long]] =
    mutable.HashMap.empty

  private def evictMin(b: mutable.HashMap[String, Array[Long]]): (String, Long) = {
    // deterministic tie-break (smallest item string) so partial-agg
    // scheduling cannot change the result
    var minK: String = null
    var minC = Long.MaxValue
    b.foreach { case (k, v) =>
      if (v(0) < minC || (v(0) == minC && (minK == null || k < minK))) {
        minK = k; minC = v(0)
      }
    }
    b.remove(minK)
    (minK, minC)
  }

  override def update(b: mutable.HashMap[String, Array[Long]],
                      input: InternalRow): mutable.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      b.get(s) match {
        case Some(c) => c(0) += 1
        case None if b.size < capacity => b.put(s, Array(1L, 0L))
        case None =>
          val (_, minC) = evictMin(b)
          b.put(s, Array(minC + 1, minC))
      }
    }
    b
  }

  override def merge(b1: mutable.HashMap[String, Array[Long]],
                     b2: mutable.HashMap[String, Array[Long]]): mutable.HashMap[String, Array[Long]] = {
    val min1 = if (b1.size < capacity) 0L else b1.valuesIterator.map(_(0)).min
    val min2 = if (b2.size < capacity) 0L else b2.valuesIterator.map(_(0)).min
    val out = mutable.HashMap.empty[String, Array[Long]]
    (b1.keySet ++ b2.keySet).foreach { k =>
      (b1.get(k), b2.get(k)) match {
        case (Some(a), Some(c)) => out.put(k, Array(a(0) + c(0), a(1) + c(1)))
        case (Some(a), None) => out.put(k, Array(a(0) + min2, a(1) + min2))
        case (None, Some(c)) => out.put(k, Array(c(0) + min1, c(1) + min1))
        case _ =>
      }
    }
    if (out.size > capacity) {
      // one sort instead of O(capacity) full-map evictMin scans; keep
      // the SAME deterministic order evictMin uses: (count asc, key asc)
      // evicted first ⇔ keep (count desc, key desc) head
      val keep = out.toSeq.sortBy { case (k, v) => (v(0), k) }.reverse.take(capacity)
      out.clear()
      keep.foreach { case (k, v) => out.put(k, v) }
    }
    out
  }

  override def eval(b: mutable.HashMap[String, Array[Long]]): Any = {
    val sorted = b.toSeq.sortBy(_._1) // key order: deterministic map data
    ArrayBasedMapData(
      sorted.map(kv => UTF8String.fromString(kv._1)).toArray,
      sorted.map(kv => new GenericArrayData(kv._2): Any).toArray)
  }

  override def serialize(b: mutable.HashMap[String, Array[Long]]): Array[Byte] = {
    val entries = b.toSeq
    val bytes = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + bytes.map(_.length + 4 + 16).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.size)
    entries.zip(bytes).foreach { case ((_, v), kb) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(v(0)); bb.putLong(v(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = mutable.HashMap.empty[String, Array[Long]]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      b.put(new String(kb, StandardCharsets.UTF_8), Array(bb.getLong, bb.getLong))
      i += 1
    }
    b
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_sketch expects a string item, got ${child.dataType.simpleString}")

  override def dataType: DataType =
    MapType(StringType, ArrayType(LongType, containsNull = false), valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
}

object TopKSketch {
  /** SQL builder: `topk_sketch(item)` or `topk_sketch(item, capacity)`
    * with a literal int capacity. Extra/non-literal arguments FAIL
    * rather than being silently dropped (a user passing a large
    * capacity and getting lossy 256-capacity estimates would have no
    * way to notice).
    */
  def fromArgs(exprs: Seq[Expression], defaultCapacity: Int): TopKSketch =
    exprs match {
      case Seq(item) => TopKSketch(item, defaultCapacity)
      case Seq(item, cap) if cap.foldable =>
        cap.eval() match {
          case i: Int => TopKSketch(item, i)
          case l: Long => TopKSketch(item, math.toIntExact(l))
          case other => throw new IllegalArgumentException(
            s"topk_sketch capacity must be an integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(
        "usage: topk_sketch(item[, capacity_literal])")
    }

  /** Register `topk_sketch(item[, capacity])` in the session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession, capacity: Int = 256): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_sketch",
      exprs => fromArgs(exprs, capacity),
      "scala_udf")
}
