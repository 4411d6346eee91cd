package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native as-of join — the tier-(c) custom operator of SURVEY §4's
  * preference order: a whole-operator semantic Spark lacks, expressed as
  * marker predicate → planner strategy → custom physical operator, all
  * registered through `SparkSessionExtensions` ([[GraftExtensions]]).
  *
  * Semantics: for each left row, join the SINGLE right row with the same
  * key and the greatest (rightTime, tieBreak) such that
  * `rightTime <= leftTime` (inner — unmatched left rows drop). The
  * declarative formulation (candidate equi-join + row_number()=1)
  * materialises every qualifying candidate pair first; this operator is
  * the single-pass sort-merge: each side shuffles ONCE on its key, sorts
  * by (key, time, tieBreak), and a linear partition walk carries the
  * latest right row per key — O(left + right), no candidate blow-up, the
  * plan shape that survives 100 TB.
  *
  * Public API ([[Asof.join]]) plants an [[AsOfLatest]] marker conjunct in
  * an ordinary inner-join condition; [[AsOfJoinStrategy]] recognises the
  * shape and plans [[AsOfJoinExec]]. Without [[GraftExtensions]] the
  * marker is Unevaluable and execution fails fast — the operator is
  * opt-in by session construction, like any extension-provided plan.
  */
object Asof {
  /** Runtime registration for sessions NOT built with [[GraftExtensions]]
    * (e.g. the driver's Verify/Bench sessions): the marker function goes
    * into the session's function registry and the strategy into the
    * PUBLIC `spark.experimental.extraStrategies` hook. Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "asof_latest", exprs => AsOfLatest(exprs), "scala_udf")
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** left as-of right. `rightTieBreak` resolves equal-time ties (the
    * greatest wins), mirroring join_asof's `ORDER BY time DESC, id DESC`
    * tiebreak. Requires a session built with [[GraftExtensions]] — or a
    * [[register]] call on an existing session.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column,
           rightTieBreak: Column): DataFrame =
    left.join(right,
      leftKey === rightKey && rightTime <= leftTime &&
        call_function("asof_latest", rightTime, leftTime, rightTieBreak))
}

/** Marker predicate: "this right row is the latest match for its left
  * row". Unevaluable on purpose — it only exists to be recognised (and
  * consumed) by [[AsOfJoinStrategy]]. Children: (rightTime, leftTime,
  * rightTieBreak).
  */
case class AsOfLatest(children: Seq[Expression])
    extends Expression with Unevaluable {
  require(children.length == 3,
    "asof_latest(rightTime, leftTime, rightTieBreak)")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** Plans `Join(..., keyEq && rightTime <= leftTime && asof_latest(...))`
  * as [[AsOfJoinExec]]. The condition must be exactly those three
  * conjuncts; anything else falls through to the default planner (and
  * fails on the Unevaluable marker — a deliberate loud failure rather
  * than silently-wrong all-pairs semantics).
  */
object AsOfJoinStrategy extends SparkStrategy with PredicateHelper {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, Inner, Some(cond), _)
        if cond.exists(_.isInstanceOf[AsOfLatest]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val marker = conjuncts.collectFirst { case m: AsOfLatest => m }
      val keyEq = conjuncts.collectFirst {
        case EqualTo(a, b) if a.references.subsetOf(l.outputSet) &&
          b.references.subsetOf(r.outputSet) => (a, b)
        case EqualTo(a, b) if b.references.subsetOf(l.outputSet) &&
          a.references.subsetOf(r.outputSet) => (b, a)
      }
      val timeLe = conjuncts.collectFirst {
        case LessThanOrEqual(a, b) if a.references.subsetOf(r.outputSet) &&
          b.references.subsetOf(l.outputSet) => (b, a) // (leftTime, rightTime)
        case GreaterThanOrEqual(a, b) if a.references.subsetOf(l.outputSet) &&
          b.references.subsetOf(r.outputSet) => (a, b)
      }
      (marker, keyEq, timeLe) match {
        case (Some(m), Some((lk, rk)), Some((lt, rt))) if conjuncts.length == 3 =>
          AsOfJoinExec(lk, rk, lt, rt, m.children(2),
            planLater(l), planLater(r)) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Single-pass sort-merge as-of join. Both children cluster on their key
  * and sort by (key, time[, tieBreak]) — EnsureRequirements inserts the
  * one exchange + sort per side; the walk itself is O(left + right) per
  * partition with one buffered right cursor and the latest matching
  * right row carried as state.
  */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      // partition-walk state: the latest right row seen for lastKey
      var lastKey: InternalRow = null
      var lastRight: InternalRow = null
      lIter.flatMap { lrow =>
        val lkRow = lKeyProj(lrow)
        val ltRow = lTimeProj(lrow)
        if (lkRow.isNullAt(0) || ltRow.isNullAt(0)) Iterator.empty
        else {
          var continue = true
          while (continue && rBuf.hasNext) {
            val head = rBuf.head
            val rkRow = rKeyProj(head)
            if (rkRow.isNullAt(0)) { // null keys never match; skip
              rBuf.next(); lastKey = null; lastRight = null
            } else {
              val c = keyOrd.compare(rkRow, lkRow)
              if (c < 0) { rBuf.next(); lastKey = null; lastRight = null }
              else if (c == 0) {
                val rtRow = rTimeProj(head)
                if (rtRow.isNullAt(0)) {
                  // null time never matches — CONSUME it (nulls sort
                  // first, so stopping here would stall the cursor and
                  // hide every later valid row of this key)
                  rBuf.next()
                } else if (timeOrd.compare(rtRow, ltRow) <= 0) {
                  lastKey = rkRow.copy()
                  lastRight = rBuf.next().copy()
                } else continue = false
              } else continue = false
            }
          }
          if (lastKey != null && keyOrd.compare(lastKey, lkRow) == 0)
            Iterator.single(resultProj(joined(lrow, lastRight)))
          else Iterator.empty
        }
      }
    }
  }
}
