package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Two-level (coarse→fine) variant of [[NearestCells]] for LARGE cell
  * counts — the IMI/coarse-quantizer idea every production IVF uses
  * (faiss's quantizer-over-centroids): when `nlist` scales with the
  * corpus (a fixed target cell size, [[graft.operators.EmbedDedup]]'s
  * dial), the flat expression's per-row argmax is O(nlist·d) and the
  * whole assign pass a hidden O(n²·d/cellsize). This expression groups
  * its own centroids under ⌈√ncells⌉ coarse centers at construction
  * (driver-side Lloyd over ncells rows — trivial), then per row scores
  * the coarse level first and descends only into the `wCoarse` best
  * groups: O((√ncells)·(1+wCoarse)·d) per row, O(n^1.5) per pass.
  *
  * Semantics vs the flat form:
  *  - scoring is bit-identical ([[CosineSimilarity]]'s fold order,
  *    precomputed norms) and selection uses the same
  *    `java.lang.Double.compare` descending with smallest-cell-id ties,
  *    over the UNION of the probed groups' members scanned in ascending
  *    cell-id order;
  *  - the result is therefore EXACTLY [[NearestCells]] whenever the true
  *    top-`nprobe` cells live in the probed groups — and bit-identical
  *    by construction at `wCoarse ≥ ncoarse` (every group probed), the
  *    property the spec pins;
  *  - at bounded `wCoarse` the assignment is approximate near coarse-group
  *    boundaries — acceptable for BLOCKING (a near-boundary vector lands
  *    in a neighbouring, still-close cell; recall is measured in
  *    EmbedDedupSpec), NOT for the bit-identity contracts sim_ivf pins,
  *    which keep the flat expression;
  *  - fail-loud contract unchanged: dimension mismatch and null elements
  *    throw, a NULL embedding yields a NULL probe list.
  *
  * Like [[NearestCells]], two carriers share one kernel: the literal
  * form below re-runs the coarse-level Lloyd lazily PER TASK (fine at
  * fixture nlist, where it is a microsecond), while
  * [[NearestCellsCoarseBc]] broadcasts the fully-built
  * [[NearestCellsCoarse.CoarseTable]] — at corpus-scale nlist the build
  * is O(nlist^1.5·d) and must run once driver-side, not once per task.
  */
case class NearestCellsCoarse(child: Expression, cells: Seq[Long],
                              centroids: Seq[Seq[Double]], nprobe: Int,
                              wCoarse: Int)
    extends UnaryExpression {

  require(cells.nonEmpty && cells.length == centroids.length,
    s"nearest_cells_coarse: ${cells.length} ids for ${centroids.length} centroids")
  require(nprobe >= 1, s"nearest_cells_coarse: nprobe must be >= 1, got $nprobe")
  require(wCoarse >= 1, s"nearest_cells_coarse: wCoarse must be >= 1, got $wCoarse")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells_coarse expects array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val table: NearestCellsCoarse.CoarseTable =
    NearestCellsCoarse.build(cells, centroids)

  override def nullSafeEval(input: Any): Any =
    NearestCellsCoarse.eval(input.asInstanceOf[ArrayData], table, nprobe, wCoarse)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCellsCoarse", this,
      classOf[NearestCellsCoarse].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsCoarse =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells_coarse"
}

/** [[NearestCellsCoarse]] over a broadcast prebuilt [[NearestCellsCoarse.
  * CoarseTable]] — same kernel, identical descent; the table (fine
  * matrix + coarse level + groups) is built once driver-side and
  * torrent-fetched once per executor instead of being rebuilt from
  * serialized Seq literals in every task.
  */
case class NearestCellsCoarseBc(child: Expression,
                                bc: Broadcast[NearestCellsCoarse.CoarseTable],
                                nprobe: Int, wCoarse: Int)
    extends UnaryExpression {

  require(nprobe >= 1, s"nearest_cells_coarse_bc: nprobe must be >= 1, got $nprobe")
  require(wCoarse >= 1, s"nearest_cells_coarse_bc: wCoarse must be >= 1, got $wCoarse")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells_coarse_bc expects array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NearestCellsCoarse.eval(input.asInstanceOf[ArrayData], bc.value, nprobe, wCoarse)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCellsCoarseBc", this,
      classOf[NearestCellsCoarseBc].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (ArrayData) $self.nullSafeEval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsCoarseBc =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells_coarse_bc"
}

object NearestCellsCoarse {
  /** Fine table (cell-id-sorted, as [[NearestCells.Cents]]) plus the
    * coarse level: `coarseMat`/`coarseSq` are the group centers,
    * `groups(g)` the ascending fine INDICES of group g.
    */
  final case class CoarseTable(ids: Array[Long], mat: Array[Array[Double]],
                               sqNorms: Array[Double],
                               coarseMat: Array[Array[Double]],
                               coarseSq: Array[Double],
                               groups: Array[Array[Int]]) {
    def ncells: Int = ids.length
    def dim: Int = mat.head.length
    def ncoarse: Int = coarseMat.length
  }

  /** Build the two-level table with a deterministic driver-side Lloyd
    * over the fine centroids (init = evenly-strided centroids in cell-id
    * order; ≤ 8 rounds, converged on exact equality; empty groups keep
    * their center). Cosine here only GROUPS — every returned cell is
    * still scored with the exact formula.
    */
  def build(cells: Seq[Long], centroids: Seq[Seq[Double]]): CoarseTable = {
    val ncells = cells.length
    val dim = centroids.head.length
    val ncoarse = math.max(1, math.ceil(math.sqrt(ncells.toDouble)).toInt)
    val sorted = cells.zip(centroids).sortBy(_._1)
    val i = sorted.map(_._1).toArray
    val m = sorted.map(_._2.toArray).toArray
    def sq(c: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < c.length) { s += c(k) * c(k); k += 1 }
      s
    }
    val n = m.map(sq)
    def cos(a: Array[Double], na: Double, b: Array[Double], nb: Double): Double = {
      var dot = 0.0; var k = 0
      while (k < a.length) { dot += a(k) * b(k); k += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    var cm = Array.tabulate(ncoarse)(g => m(((g.toLong * ncells) / ncoarse).toInt).clone())
    var cn = cm.map(sq)
    val assignTo = new Array[Int](ncells)
    var round = 0
    var converged = false
    while (!converged && round < 8) {
      var f = 0
      while (f < ncells) {
        var best = 0; var g = 1
        while (g < ncoarse) {
          if (java.lang.Double.compare(cos(m(f), n(f), cm(g), cn(g)),
              cos(m(f), n(f), cm(best), cn(best))) > 0) best = g
          g += 1
        }
        assignTo(f) = best
        f += 1
      }
      val next = Array.fill(ncoarse)(new Array[Double](dim))
      val cnt = new Array[Int](ncoarse)
      var f2 = 0
      while (f2 < ncells) {
        val g = assignTo(f2); cnt(g) += 1
        var k = 0
        while (k < dim) { next(g)(k) += m(f2)(k); k += 1 }
        f2 += 1
      }
      var g2 = 0
      while (g2 < ncoarse) {
        if (cnt(g2) > 0) { var k = 0; while (k < dim) { next(g2)(k) /= cnt(g2); k += 1 } }
        else next(g2) = cm(g2)
        g2 += 1
      }
      converged = (0 until ncoarse).forall(g => java.util.Arrays.equals(next(g), cm(g)))
      cm = next
      cn = cm.map(sq)
      round += 1
    }
    // One final assignment pass against the FINAL centers: when Lloyd
    // exits at the round cap without converging, `assignTo` above reflects
    // the pre-update centers while queries score the post-update coarseMat
    // — a group/center mismatch that worsens bounded-wCoarse drift. On a
    // converged exit this pass is a no-op (centers are a fixed point).
    var ff = 0
    while (ff < ncells) {
      var best = 0; var g = 1
      while (g < ncoarse) {
        if (java.lang.Double.compare(cos(m(ff), n(ff), cm(g), cn(g)),
            cos(m(ff), n(ff), cm(best), cn(best))) > 0) best = g
        g += 1
      }
      assignTo(ff) = best
      ff += 1
    }
    val gr = Array.fill(ncoarse)(List.newBuilder[Int])
    var f3 = 0
    while (f3 < ncells) { gr(assignTo(f3)) += f3; f3 += 1 }
    CoarseTable(i, m, n, cm, cn, gr.map(_.result().toArray))
  }

  /** The shared per-row kernel (both carriers call exactly this). */
  private[functions] def eval(e: ArrayData, t: CoarseTable, nprobe: Int,
                              wCoarse: Int): Any = {
    val dim = t.dim
    val ncells = t.ncells
    val ncoarse = t.ncoarse
    val probes = math.min(nprobe, ncells)
    require(e.numElements() == dim,
      s"nearest_cells_coarse: embedding has ${e.numElements()} elements, expected $dim")
    val q = new Array[Double](dim)
    var v = 0
    var en = 0.0
    while (v < dim) {
      require(!e.isNullAt(v), s"nearest_cells_coarse: null element at index $v")
      val x = e.getDouble(v)
      q(v) = x
      en += x * x
      v += 1
    }
    val enr = math.sqrt(en)
    // coarse pass: top-wCoarse groups, NearestCells' selection discipline
    val csims = new Array[Double](ncoarse)
    var g = 0
    while (g < ncoarse) {
      val cent = t.coarseMat(g)
      var dot = 0.0; var i = 0
      while (i < dim) { dot += q(i) * cent(i); i += 1 }
      csims(g) = dot / (enr * math.sqrt(t.coarseSq(g)))
      g += 1
    }
    val w = math.min(wCoarse, ncoarse)
    val cused = new Array[Boolean](ncoarse)
    var cand = 0
    val picked = new Array[Int](w)
    var r = 0
    while (r < w) {
      var best = -1
      var k = 0
      while (k < ncoarse) {
        if (!cused(k) && (best < 0 ||
            java.lang.Double.compare(csims(k), csims(best)) > 0)) best = k
        k += 1
      }
      cused(best) = true
      picked(r) = best
      cand += t.groups(best).length
      r += 1
    }
    // fine pass over the probed groups' members, ascending cell-id order
    // so strict > on ties keeps the smallest id — the flat tiebreak
    val fidx = new Array[Int](cand)
    var p = 0; var fi = 0
    while (p < w) {
      val members = t.groups(picked(p))
      var j = 0
      while (j < members.length) { fidx(fi) = members(j); fi += 1; j += 1 }
      p += 1
    }
    java.util.Arrays.sort(fidx)
    val fsims = new Array[Double](cand)
    var c = 0
    while (c < cand) {
      val cent = t.mat(fidx(c))
      var dot = 0.0; var i = 0
      while (i < dim) { dot += q(i) * cent(i); i += 1 }
      fsims(c) = dot / (enr * math.sqrt(t.sqNorms(fidx(c))))
      c += 1
    }
    val k = math.min(probes, cand)
    val out = new Array[Long](k)
    val used = new Array[Boolean](cand)
    var r2 = 0
    while (r2 < k) {
      var best = -1
      var j = 0
      while (j < cand) {
        if (!used(j) && (best < 0 ||
            java.lang.Double.compare(fsims(j), fsims(best)) > 0)) best = j
        j += 1
      }
      used(best) = true
      out(r2) = t.ids(fidx(best))
      r2 += 1
    }
    new GenericArrayData(out)
  }
}
