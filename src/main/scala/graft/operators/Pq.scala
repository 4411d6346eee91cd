package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory/shuffle-footprint answer for
  * embedding search at corpus scale, completing the similarity menu
  * (exact [[Ann.bruteTopK]], hyperplane LSH [[Ann]], coarse cells
  * [[Ivf]]): split each d-dim vector into `m` subvectors, quantize each
  * subspace to `ksub` centroids (trained on a bounded sample,
  * driver-side — only ENCODE sees the full data), and represent every
  * vector as m one-byte codes in a BINARY column (ksub ≤ 256 enforced
  * at the expression — an array<int> would quietly cost 4×+). 64
  * doubles (512 B) become m bytes — 16 B at the shipped dial, a 32×
  * smaller data side for every scan, shuffle,
  * and cache — that is the 100 TB argument, and it composes with
  * [[Ivf]] cells (IVF-PQ) when candidate pruning is also needed.
  *
  * Scoring is asymmetric distance (ADC): the query stays full-precision
  * and is compared against code CENTROIDS — squared L2 per subspace,
  * summed. On L2-normalized inputs, ascending L2² ranks identically to
  * descending cosine, so recall is measured against the cosine oracle.
  * This implementation recomputes subspace distances per (query,
  * candidate) pair (dim multiply-adds, the same arithmetic cost the
  * full-precision scan pays) — the classic per-query m×ksub lookup
  * table is a straightforward executor-side memoization left until a
  * profile demands it; the storage/shuffle compression is the win this
  * operator ships.
  *
  * Training follows [[Ivf.centroids]]'s discipline: deterministic
  * hash-ordered sample, Lloyd with empty-cell preservation, fixed
  * iteration cap — O(sampleN · ksub · dim · iters) driver work, tiny.
  */
object Pq {
  /** codebooks(subspace)(code)(sub-dimension) */
  type Codebooks = Array[Array[Array[Double]]]

  /** Train per-subspace codebooks on a bounded hash-ordered sample. */
  def train(data: DataFrame, m: Int = 8, ksub: Int = 16,
            sampleN: Int = 2000, iters: Int = 10): Codebooks = {
    val sample = data.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleN).select(col("e"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "pq train: empty input")
    val dim = sample.head.length
    require(dim % m == 0, s"pq train: dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      lloyd(sub, math.min(ksub, sub.length), iters)
    }
  }

  private def nearest(cents: Array[Array[Double]], x: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      while (i < x.length) { val t = x(i) - cents(c)(i); d += t * t; i += 1 }
      // strict < keeps the lowest code on ties — deterministic
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def lloyd(xs: Array[Array[Double]], k: Int,
                    iters: Int): Array[Array[Double]] = {
    val dsub = xs.head.length
    // init: first k sample rows (already hash-ordered — the same
    // deterministic seedless sample Ivf.init uses)
    var cents = xs.take(k).map(_.clone)
    var round = 0
    while (round < iters) {
      val sums = Array.fill(k)(new Array[Double](dsub))
      val counts = new Array[Int](k)
      for (x <- xs) {
        val c = nearest(cents, x)
        counts(c) += 1
        var i = 0
        while (i < dsub) { sums(c)(i) += x(i); i += 1 }
      }
      // empty cells keep their previous centroid (Ivf.step's rule)
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c)))
      round += 1
    }
    cents
  }

  /** Expose a codebook-configured expression through the function
    * registry (Spark 4's Column hides Expression — the LshProbes seam).
    * The name keys on the codebook CONTENT hash: a session may hold
    * several trained indexes, and DataFrame analysis is eager, so each
    * frame binds its own registration at construction time.
    */
  private def registered(df: DataFrame, prefix: String, cb: Codebooks,
      mk: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[Column] => Column = {
    val name = s"${prefix}_${Integer.toHexString(java.util.Arrays.deepHashCode(
      cb.asInstanceOf[Array[AnyRef]]))}"
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, mk, "scala_udf")
    cols => call_function(name, cols: _*)
  }

  /** Unit-normalize an (vec_id, e) embedding frame — shared by the
    * shipped query, the sweep, and the specs so the normalization the
    * recall numbers describe is the one the query runs. Native fused
    * expression (r7): index builds scan the corpus several times and the
    * interpreted HOF chain was re-executed on every scan — the dominant
    * share of sim_ivf_pq's 100× build. Fails loud on zero/non-finite
    * norms (r6 ADVICE) instead of silently indexing Infinity/NaN codes.
    */
  def unitNormalized(df: DataFrame): DataFrame = {
    graft.functions.UnitNormalize.register(df.sparkSession)
    df.select(col("vec_id"), graft.functions.UnitNormalize(col("e")).as("e"))
  }

  /** The r6 HOF reference form — kept so the fusion spec proves the
    * compiled path bit-identical on real data (zero-norm behavior
    * deviates BY DESIGN: this form silently divides by zero).
    */
  private[graft] def unitNormalizedHof(df: DataFrame): DataFrame =
    df.withColumn("__nrm", sqrt(aggregate(
        transform(col("e"), (x: Column) => x * x),
        lit(0.0), (acc: Column, x: Column) => acc + x)))
      .select(col("vec_id"),
        transform(col("e"), (x: Column) => x / col("__nrm")).as("e"))

  /** (vec_id, code binary) — the compressed data side: m bytes/vector. */
  def encode(data: DataFrame, cb: Codebooks): DataFrame = {
    val enc = registered(data, "pq_encode", cb,
      exprs => graft.functions.PqEncode(exprs.head, cb))
    data.select(col("vec_id"), enc(Seq(col("e"))).as("code"))
  }

  /** Encode an already cell-assigned frame (vec_id, cell, e) → (vec_id,
    * cell, code): the coded data side of IVF-PQ as ONE projection over an
    * existing assignment — no second corpus scan, no vec_id re-join.
    * Shared by the in-query [[ivfPqTopK]] build and the prebuilt
    * [[SimIndexes.ivfPq]] seam.
    */
  def encodeAssigned(assigned: DataFrame, cb: Codebooks): DataFrame = {
    val enc = registered(assigned, "pq_encode", cb,
      exprs => graft.functions.PqEncode(exprs.head, cb))
    assigned.select(col("vec_id"), col("cell"), enc(Seq(col("e"))).as("code"))
  }

  /** IVF-PQ — the canonical production composition at corpus scale:
    * IVF cells prune the CANDIDATE count (each query scores only its
    * `nprobe` nearest cells), PQ codes shrink the candidate BYTES (the
    * cell-joined side carries m-byte codes, never embeddings). Both
    * dials measured separately in SweepIvf; this wires them together.
    * Inputs must be unit-normalized ([[unitNormalized]]) so cell
    * assignment (cosine) and ADC rerank (L2) agree on geometry.
    */
  /** Shared rank-and-trim tail for the ADC scorers: ascending distance,
    * vec_id tiebreak, one convention — three hand-copies would let the
    * operators' ranking semantics silently desynchronize.
    */
  private def topKByDistance(cand: DataFrame, adcScore: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("d").asc, col("vec_id").asc)
    cand.filter(col("vec_id") =!= col("qid"))
      .withColumn("d", round(adcScore, 5))
      // Narrow BEFORE the rank window: the distance is computed, so the
      // exchange ships (qid, vec_id, d) — ~28 B/row — instead of dragging
      // the 512-byte query embedding through a candidates-sized shuffle
      // (measured 100×: the wide form shuffled ~14 GB for 25M candidates).
      .select(col("qid"), col("vec_id"), col("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("vec_id"), col("d"))
  }

  def ivfPqTopK(queries: DataFrame, data: DataFrame, k: Int,
                nlist: Int = 8, nprobe: Int = 4,
                m: Int = 16, ksub: Int = 256, iters: Int = 2,
                index: Option[(DataFrame, Codebooks, DataFrame)] = None): DataFrame = {
    // prebuilt (cents, codebooks, codedCells) reuses one trained index
    // across calls (the Ivf.topK seam); otherwise train both quantizers
    // and encode cells + codes in ONE pass over the assigned frame — no
    // second corpus scan, no vec_id re-join
    val (cents, cb, codedCells) = index.getOrElse {
      val c = Ivf.centroids(data, nlist, iters)
      val codebooks = train(data, m, ksub)
      (c, codebooks, encodeAssigned(Ivf.assign(data, c), codebooks))
    }
    val adc = registered(data, "pq_adc", cb,
      exprs => graft.functions.PqAdc(exprs.head, exprs(1), cb))
    val probes = Ivf.probeCells(queries, cents, nprobe)
    topKByDistance(probes.join(codedCells, Seq("cell")),
      adc(Seq(col("qe"), col("code"))), k)
  }

  /** Per-query top-k by ascending ADC distance over the ENCODED corpus:
    * the scan/join side carries m bytes per vector, never the embedding.
    * Queries broadcast (bounded set, as in [[Ann.bruteTopK]]).
    */
  def topK(queries: DataFrame, encoded: DataFrame, cb: Codebooks, k: Int): DataFrame = {
    val adc = registered(encoded, "pq_adc", cb,
      exprs => graft.functions.PqAdc(exprs.head, exprs(1), cb))
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("e").as("qe")))
    topKByDistance(q.join(encoded, col("vec_id") =!= col("qid")),
      adc(Seq(col("qe"), col("code"))), k)
  }
}
