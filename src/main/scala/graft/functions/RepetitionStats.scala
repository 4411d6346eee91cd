package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's intra-document
  * repetition signals (Gopher, Rae et al. 2021 §A1.1) in one fused
  * per-row pass — the shuffle-free form of `text_repetition`.
  *
  * The declarative formulation has to find the per-doc TOP BIGRAM with
  * a (doc_id, bigram) count aggregate + struct-max argmax + join back —
  * one full shuffle of every bigram instance in the corpus plus two
  * aggregation exchanges, for a quantity that is a pure function of the
  * row. This expression computes everything row-locally:
  *   - bigram counts in one open-addressed pass over the token array;
  *     top bigram by (count, then bytewise-greatest bigram) — the SAME
  *     tie rule as the struct-max (`max(struct(c, bg))`) it replaces
  *     and the oracle's `ORDER BY c DESC, bg DESC`;
  *   - trigram distinct count via a HashSet (n_tri − distinct =
  *     duplicate trigram instances, ≡ `size − size(array_distinct)`).
  *
  * Input: the token ARRAY (tokenization stays declarative and shared
  * with the other text operators). Output struct:
  * (n_tokens, top_bigram, top_bigram_n, n_tri, n_tri_dup) — the frac
  * divisions stay in the projection so the rounding contract is visible
  * at the query site. Requires ≥ 3 tokens (caller filters, as the
  * declarative form did).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_bigram", StringType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_tri", LongType, nullable = false),
    StructField("n_tri_dup", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    require(n >= 3, s"repetition_stats requires >= 3 tokens, got $n (caller must filter)")
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) { words(i) = toks.getUTF8String(i); i += 1 }

    val sep = UTF8String.fromString(" ")
    // bigram counts; top by (count, then bytewise-greatest bigram)
    val bigrams = new java.util.HashMap[UTF8String, Long]()
    i = 0
    while (i < n - 1) {
      val bg = UTF8String.concat(words(i), sep, words(i + 1))
      bigrams.merge(bg, 1L, (a, b) => a + b)
      i += 1
    }
    var topBg: UTF8String = null
    var topN = 0L
    val it = bigrams.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > topN ||
          (e.getValue == topN && e.getKey.compareTo(topBg) > 0)) {
        topBg = e.getKey; topN = e.getValue
      }
    }

    val trigrams = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < n - 2) {
      trigrams.add(UTF8String.concat(words(i), sep, words(i + 1), sep, words(i + 2)))
      i += 1
    }
    val nTri = (n - 2).toLong

    val row = new GenericInternalRow(5)
    row.update(0, n.toLong)
    row.update(1, topBg)
    row.update(2, topN)
    row.update(3, nTri)
    row.update(4, nTri - trigrams.size())
    row
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("repStats", this, classOf[RepetitionStats].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (InternalRow) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  /** Function-registry injection (the CosineSimilarity pattern). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "repetition_stats", exprs => RepetitionStats(exprs(0)), "scala_udf")

  /** Column-API entry point (requires [[register]] in the session). */
  def apply(toks: Column): Column =
    org.apache.spark.sql.functions.call_function("repetition_stats", toks)
}
