package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's winnowing
  * fingerprint set (Schleimer et al. 2003) in one fused pass
  * (SURVEY.md §4.3 preference: custom `Expression` over interpreted HOF
  * trees).
  *
  * Semantics are IDENTICAL to the declarative form in
  * `graft.queries.Extra4.winnowFingerprints` (which is kept as the
  * equality reference, the `lshCandidatesWindowed` precedent):
  * md5-hash every k-char gram, take the minimum hash of each sliding
  * window of w consecutive gram hashes, return the sorted distinct
  * fingerprint set as `array<string>` of lowercase hex.
  *
  * Why fused: the HOF formulation interprets THREE nested
  * CodegenFallback lambdas per row (gram transform, window transform,
  * sort comparator) and allocates a hex string per gram, a slice copy
  * per window, and intermediate arrays per stage. This expression:
  *   - hashes each gram ONCE into its 16-byte digest (no hex until a
  *     digest is actually selected — hex encoding is order-preserving
  *     over unsigned bytes, so digests compare exactly like the hex
  *     strings the oracle sees);
  *   - takes window minima with a monotonic deque — O(n) total instead
  *     of O(n·w) slice-and-scan;
  *   - converts only the ≤ n/2 selected fingerprints to hex, then
  *     sorts the distinct set.
  *
  * Unicode fidelity: grams are taken with `UTF8String.substringSQL` —
  * the SAME routine Spark's `substr` uses — so multi-byte text produces
  * byte-identical grams to the declarative form (a Java
  * `String.substring` over UTF-16 units would diverge on supplementary
  * characters; spec-pinned).
  *
  * Degenerate inputs: fewer than one full window (numChars < k + w − 1)
  * returns an EMPTY array. The declarative form is undefined there
  * (Spark's `sequence(1, n)` flips direction for n < 1), which is why
  * `text_winnow` filters such rows out before either formulation; the
  * expression totalizes the edge instead of inheriting it.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow_fps requires k >= 1 and w >= 1, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects string input, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  /** Unsigned lexicographic digest comparison ≡ comparison of the hex
    * encodings (hex is order-preserving over unsigned bytes).
    */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val nChars = text.numChars()
    val nGrams = nChars - k + 1
    val nWindows = nGrams - w + 1
    if (nWindows < 1) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      // substringSQL is 1-based and codepoint-indexed — Spark's substr
      md.reset()
      digests(i) = md.digest(text.substringSQL(i + 1, k).getBytes)
      i += 1
    }
    // Monotonic deque of candidate indices: ascending digest order,
    // front = current window minimum. Strictly-greater eviction keeps
    // the EARLIEST index among equal digests — irrelevant to the output
    // set (equal digests are one fingerprint) but documented for
    // determinism review.
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail)
    val selected = new java.util.TreeSet[Array[Byte]]((a, b) => cmp(a, b))
    i = 0
    while (i < nGrams) {
      while (tail > head && cmp(digests(deque(tail - 1)), digests(i)) > 0)
        tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) selected.add(digests(deque(head)))
      i += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = hex(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The LshProbes discipline: ship the expression instance and run the
    // whole per-row computation in one JIT-compiled method called from
    // generated code — no per-element lambda interpretation.
    val self = ctx.addReferenceObj("winnowFps", this,
      classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (ArrayData) $self.nullSafeEval($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

object WinnowFingerprints {
  /** Function-registry injection (Spark 4's Column has no public
    * Expression accessor — the CosineSimilarity pattern). k and w arrive
    * as integer literals.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fps", exprs => WinnowFingerprints(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "scala_udf")

  /** Column-API entry point (requires [[register]] in the session). */
  def apply(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.functions.call_function("winnow_fps", text,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(w))
}
