package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's token-histogram
  * statistics in one fused per-row pass — the shuffle-free core of
  * `text_entropy`, `text_quality` and `text_clean`.
  *
  * All four outputs are pure functions of the row's token array, but
  * the declarative forms paid a corpus-wide (doc_id, token) hash
  * aggregate (plus a second per-doc aggregate) to compute them. One
  * open hashmap pass per row yields:
  *   - `n_tokens`   — token instances;
  *   - `n_distinct` — distinct tokens;
  *   - `n_stop`     — instances that are stopwords (the constructor's
  *                    lexicon, matched exactly);
  *   - `sclc`       — Σ c·log2(c) over the histogram, the entropy
  *                    numerator (entropy = log2(n) − sclc/n at the
  *                    query site, keeping the rounding contract there).
  *
  * Float honesty: the Σ c·log2 c fold order here is hashmap iteration
  * order, vs partial-aggregation order in the declarative form and
  * DuckDB's own order — all differ at ~1e-15 and every consumer rounds
  * to 6 dp (the text_entropy budget), so oracle parity is preserved.
  */
case class TokenStats(child: Expression, stopWords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("sclc", DoubleType, nullable = false)))

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopWords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  private val log2 = math.log(2.0)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Long]()
    var nStop = 0L
    var i = 0
    while (i < n) {
      // clone: getUTF8String may return a view into a reused buffer;
      // map keys must own their bytes
      val w = toks.getUTF8String(i).clone()
      counts.merge(w, 1L, (a, b) => a + b)
      if (stopSet.contains(w)) nStop += 1
      i += 1
    }
    var sclc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      sclc += c * (math.log(c) / log2)
    }
    val row = new GenericInternalRow(4)
    row.update(0, n.toLong)
    row.update(1, counts.size().toLong)
    row.update(2, nStop)
    row.update(3, sclc)
    row
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenStats", this, classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (InternalRow) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)

  override def prettyName: String = "token_stats"
}

object TokenStats {
  /** Function-registry injection; the stop lexicon rides inside the
    * expression (constant of the query), only the token array is a
    * runtime argument.
    *
    * The registry is SHARED MUTABLE session state, so each distinct
    * lexicon must register under a distinct `name` — two builders
    * re-registering "token_stats" with different lexicons would make
    * correctness depend on registration-before-analysis ordering
    * (fragile under deferred analysis or concurrent construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession,
               stopWords: Seq[String],
               name: String = "token_stats"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => TokenStats(exprs(0), stopWords), "scala_udf")

  /** Column-API entry point (requires [[register]] in the session
    * under the same `name`).
    */
  def apply(toks: Column, name: String = "token_stats"): Column =
    org.apache.spark.sql.functions.call_function(name, toks)
}
