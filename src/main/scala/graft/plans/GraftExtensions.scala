package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.DoubleType

/** Catalyst extension point (SURVEY.md §4.3 optional polish): registers
  * the reference's geo scalars (task.ts:14-27, 37-50) as SQL functions —
  * `initial_bearing(lat1, lon1, lat2, lon2)` and
  * `haversine_m(lat1, lon1, lat2, lon2)` — via
  * `SparkSessionExtensions.injectFunction`.
  *
  * The builders return trees of BUILT-IN catalyst math expressions, so
  * the functions stay inside whole-stage codegen and pick up
  * common-subexpression elimination (the reference recomputes its radian
  * conversions per call — Catalyst dedupes them, SURVEY.md §4.1). No
  * custom Expression class, no codegen fallback.
  *
  * Usage:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   spark.sql("SELECT haversine_m(38.9, -77.0, 51.5, -0.12)")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("haversine_m"),
      new ExpressionInfo(getClass.getName, "haversine_m"),
      (args: Seq[Expression]) => haversineTree(args)))
    e.injectFunction((
      FunctionIdentifier("initial_bearing"),
      new ExpressionInfo(getClass.getName, "initial_bearing"),
      (args: Seq[Expression]) => bearingTree(args)))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => graft.functions.CosineSimilarity(args(0), args(1))))
    // Sketch aggregates, session-wide (the temp-function registration in
    // their companions covers ad-hoc sessions; extension users get them
    // without any register() call)
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSignature].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "usage: minhash_sig(hashed_shingle)")
        graft.functions.MinHashSignature(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("topk_sketch"),
      new ExpressionInfo(classOf[graft.functions.TopKSketch].getName, "topk_sketch"),
      (args: Seq[Expression]) => graft.functions.TopKSketch.fromArgs(args, 256)))
    // Native as-of join: marker predicate + planner strategy (AsOfJoinPlan)
    e.injectFunction((
      FunctionIdentifier("asof_latest"),
      new ExpressionInfo(classOf[AsOfLatest].getName, "asof_latest"),
      (args: Seq[Expression]) => AsOfLatest(args)))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private def d(e: Expression): Expression = Cast(e, DoubleType)

  private def sq(e: Expression): Expression = Multiply(e, e)

  /** Haversine meters, R = 6371000 (reference task.ts:38). */
  def haversineTree(args: Seq[Expression]): Expression = {
    require(args.length == 4, "haversine_m(lat1, lon1, lat2, lon2)")
    val Seq(lat1, lon1, lat2, lon2) = args.map(d)
    // Divide (not *0.5) so results are bit-identical to the Column API
    // in graft.functions.Geo, which writes `radians(x) / 2`.
    val halfDLat = Divide(ToRadians(Subtract(lat2, lat1)), Literal(2.0))
    val halfDLon = Divide(ToRadians(Subtract(lon2, lon1)), Literal(2.0))
    // Left-assoc like the Column API (`cos·cos·sin·sin`) — bit-identical.
    val a = Add(
      sq(Sin(halfDLat)),
      Multiply(Multiply(Multiply(Cos(ToRadians(lat1)), Cos(ToRadians(lat2))),
        Sin(halfDLon)), Sin(halfDLon)))
    Multiply(Literal(2.0 * 6371000.0), Atan2(Sqrt(a), Sqrt(Subtract(Literal(1.0), a))))
  }

  /** Initial bearing in [0, 360) (reference task.ts:14-27). */
  def bearingTree(args: Seq[Expression]): Expression = {
    require(args.length == 4, "initial_bearing(lat1, lon1, lat2, lon2)")
    val Seq(lat1, lon1, lat2, lon2) = args.map(d)
    val dLon = ToRadians(Subtract(lon2, lon1))
    val y = Multiply(Sin(dLon), Cos(ToRadians(lat2)))
    val x = Subtract(
      Multiply(Cos(ToRadians(lat1)), Sin(ToRadians(lat2))),
      Multiply(Multiply(Sin(ToRadians(lat1)), Cos(ToRadians(lat2))), Cos(dLon)))
    Pmod(Add(ToDegrees(Atan2(y, x)), Literal(360.0)), Literal(360.0))
  }
}
