package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Round-13 extension operators. The reference
  * (/root/reference/task.ts) has no analogue; this is engine surface
  * for the brief's "operations a large-scale training-data pipeline
  * would need".
  *
  * `pipeline_end2end_full` — the PRODUCTION pipeline. Round-12's
  * `pipeline_end2end` composed clean → exact dedup → prune → mix →
  * manifest; every published pipeline it emulates (RefinedWeb, DCLM)
  * runs two more stages this adds: NEAR-DUP dedup (shingle-Jaccard
  * pair graph → connected components → keep the cluster-canonical doc
  * only — the `dedup_cluster` contract) after the exact pass, and a
  * MODEL quality filter (the trained `quality_lr` classifier's keep
  * decision, ONE feature definition via
  * [[graft.operators.QualityScorer]]) between prune and mix. All seven
  * stages run as ONE query against one oracle: the 16-row manifest
  * hash transitively pins every upstream keep/drop decision, so a
  * single doc surviving near-dup dedup differently — or one flipped
  * model decision — flips a shard checksum.
  *
  * Scale shape (the 100 TB lens): stages hand off through
  * hash-partitioned relations (content hash → shingle → pair →
  * component label → score histogram → (source, shard) fill → shard
  * manifest). The near-dup stage is the exact shingle-join form — the
  * oracle-checkable contract, same as `dedup_cluster`; the REGISTERED
  * scale path is `pipeline_end2end_scale` (round 14): the identical
  * pipeline with stage 3 swapped to MinHash-LSH candidates + exact
  * verification, checked against the SAME oracle (LSH recall is 1 at
  * the fixture dial) and measured 1.9× cheaper at 100×, with the gap
  * widening with corpus duplication. The model filter is ROW-LOCAL:
  * [[graft.operators.QualityScorer.score]] with the doc payload
  * carried through, so the keep-gate adds zero shuffles (no join-back
  * — the carry seam exists exactly for this). Connected components is
  * the iterative min-label operator (small-diameter near-dup cliques
  * close in 2–3 rounds); only its per-round node-keyed aggregates
  * shuffle.
  */
object Extra7 {
  type Q = (SparkSession, String) => DataFrame

  /** graph_kcore's fixed refinement count (the PrIters analogue — the
    * same 5 as PageRank's unrolled contract): 5 h-index steps from the
    * degree seed, mirrored exactly by the oracle's bounded recursive
    * CTE. The profile (PERF.md round-15) puts the bulk of the
    * refinement mass in these steps; full convergence (~38 dependent
    * global steps at sf0.1) is the operator form's job, not the
    * benched contract's — each step is a latency-bound exchange
    * barrier, so the bounded count is the scale-honest query shape.
    */
  val KCoreSteps = 5

  /** graph_bfs's hop budget. Three levels saturate most of the
    * co-purchase graph's reachable set (average degree ~120 — one hop
    * covers half the nodes, the measured KCore finding), so the bounded
    * contract exercises the full grow-then-saturate frontier shape
    * while staying a fixed, cross-engine-checkable iteration.
    */
  val BfsHops = 3

  /** graph_sssp's relaxation-round budget. One more than [[BfsHops]]:
    * the weighted metric needs the extra round to let a cheap long
    * route overtake an expensive short one (the distinction the query
    * exists to exercise); still a fixed, cross-engine-checkable
    * iteration.
    */
  val SsspRounds = 4

  /** graph_labelprop's vote-round budget — [[BfsHops]]' value for the
    * same reason (three rounds label essentially the whole reachable
    * set on this degree-~120 graph while leaving a visible multi-round
    * diffusion gradient for the oracle to check).
    */
  val LpRounds = 3

  private def toks(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(c, " "), (t: org.apache.spark.sql.Column) => t =!= "")

  /** The part co-purchase edge relation (a < b, deduped), PERSISTED —
    * the shared input of the whole graph family (triangles / kcore /
    * bfs / labelprop; graph_sssp takes [[coPurchaseWeighted]]). The
    * caller owns the unpersist: each registered query is standalone by
    * contract so the build runs per query, while a user composing
    * several analyses builds one of these and hands it to each
    * operator. Extracted after the fifth inline copy — five
    * hand-copied builds is five places for the graph definition to
    * drift apart silently.
    */
  private[queries] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    coPurchaseEdgesPlan(s, dir).persist(StorageLevel.MEMORY_AND_DISK)

  /** The LAZY (unpersisted) edge plan — what [[coPurchaseEdges]]
    * persists per query and [[graft.operators.Graphs.index]]
    * materializes ONCE per session for the `graph_*_idx` serving rows.
    */
  private[graft] def coPurchaseEdgesPlan(s: SparkSession, dir: String): DataFrame = {
    val so = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk"))
      .distinct()
    so.alias("x")
      .join(so.alias("y"),
        col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("a"), col("y.sk").as("b"))
      .distinct()
  }

  /** [[coPurchaseEdges]] carrying the graph_sssp affinity weight
    * w = 8 − min(shared orders, 7) — integer, so path sums stay exact
    * cross-engine. PERSISTED; caller unpersists.
    */
  private def coPurchaseWeighted(s: SparkSession, dir: String): DataFrame =
    coPurchaseWeightedPlan(s, dir).persist(StorageLevel.MEMORY_AND_DISK)

  /** The lazy weighted-edge plan ([[coPurchaseEdgesPlan]]'s sibling). */
  private[graft] def coPurchaseWeightedPlan(s: SparkSession, dir: String): DataFrame = {
    val so = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk"))
      .distinct()
    so.alias("x")
      .join(so.alias("y"),
        col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .groupBy(col("x.sk").as("a"), col("y.sk").as("b"))
      .agg(count(lit(1)).as("co"))
      .select(col("a"), col("b"),
        (lit(8L) - least(col("co"), lit(7L))).as("w"))
  }

  /** The graph family's shared seed rule: the p_size = 50 parts (a
    * deterministic data-derived source set, ~2% of the catalogue).
    */
  private[graft] def seedParts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .filter(col("p_size") === 50)
      .select(col("p_partkey").as("v"))

  /** Dynamic-shard dial: target token mass per fill shard. A source's
    * md5-prefix length grows with its token mass — plen 1 (16 shards)
    * below 16·this, plen 2 (256) below 256·this, plen 3 (4096) above —
    * so a dominant source at 100 TB fans its cumsum across thousands of
    * tasks instead of serializing through a fixed 16, while fixture-
    * sized sources keep the static-16 plan EXACTLY (the identity
    * Extra7Spec pins). The kept-decision stays a pure function of
    * (m, target/shards): plen derives from the exact integer n_tokens,
    * never from floats.
    */
  val DynShardTokens = 65536L

  /** Stage 1+2 of the pipeline: clean + exact content dedup — canonical
    * = min doc_id per md5(text). Exposed as a seam so Extra7Spec can
    * run the MinHash-variant near-dup stage over the SAME survivor set
    * the query uses.
    */
  private[graft] def canonDocs(s: SparkSession, dir: String): DataFrame =
    // spread before the md5 pass (round-18, Tables.spread): the
    // fixture's one-task scan otherwise serializes stage 1's hashing
    Tables.spread(Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), col("n_chars"), col("text")))
      .withColumn("ch", md5(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("ch")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"),
        col("ch"))

  /** Distinct lowercase 3-gram word shingles of an arbitrary
    * (doc_id, text) relation — the LlmOps tokenization over a derived
    * doc set instead of the raw table.
    */
  private[graft] def shinglesOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, t) =>
        if (t.length < 3) Iterator.empty
        else (0 to t.length - 3).iterator.map { i =>
          (id, s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
        }
      }
      .toDF("doc_id", "s").distinct()
  }

  /** Exact shingle-Jaccard pair graph (jac ≥ `threshold`, rounded to 6)
    * over a given shingle relation — the dedup_cluster pair rule.
    */
  private[graft] def jaccardPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.alias("a")
      .join(sh.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jac",
        round(col("i") / (col("n1") + col("n2") - col("i")), 6))
      .filter(col("jac") >= threshold)
      .select(col("d1").as("src"), col("d2").as("dst"))
  }

  /** Stages 4–7 of the production pipeline over the near-dup-surviving
    * canon docs (doc_id, source, n_chars, ch, text): exact [P5,P95]
    * percentile prune (histogram — no global sort) → trained-model
    * keep-gate (stored quality_lr weights through the ONE
    * [[graft.operators.QualityScorer]] definition; the doc payload
    * rides the carry seam so the gate is row-local — zero shuffles, no
    * doc_id join-back) → temperature-weighted greedy (source,
    * md5-shard) budget fill → 16-shard export manifest. Shared verbatim
    * by `pipeline_end2end_full` (exact shingle-join near-dup stage, the
    * oracle contract) and `pipeline_end2end_scale` (MinHash-LSH
    * candidates + exact verification) so the two registered forms can
    * only ever differ in stage 3 — the swap the scale path exists for.
    * Returns the eagerly-materialized manifest (internal caches are
    * released before returning).
    */
  private[graft] def pipelineTail(keepNd: DataFrame): DataFrame = {
    val s = keepNd.sparkSession
    // stage 4: chars/token score + exact [P5, P95] band (corpus_prune's
    // histogram — no global sort; text CARRIES THROUGH so the model
    // gate below stays row-local)
    val scored = keepNd
      .select(col("doc_id"), col("source"), col("n_chars"), col("ch"),
        col("text"), size(toks(col("text"))).as("ntok"))
      .filter(col("ntok") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"), col("ch"),
        col("text"), col("ntok"),
        round(col("n_chars").cast("double") / col("ntok"), 4).as("score"),
        md5(col("doc_id").cast("string")).as("m"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hist = scored.groupBy(col("score")).agg(count(lit(1)).as("c"))
    val total = hist.agg(sum(col("c")).as("n"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("score"))))
      .crossJoin(broadcast(total))
    val thr = cum.agg(
      min(when(col("cum") >= ceil(lit(Extra5.PruneLoQ) * col("n")),
        col("score"))).as("lo"),
      min(when(col("cum") >= ceil(lit(Extra5.PruneHiQ) * col("n")),
        col("score"))).as("hi"))
    val kept1 = scored.crossJoin(broadcast(thr))
      .filter(col("score") >= col("lo") && col("score") <= col("hi"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("ch"),
        col("text"), col("ntok"), col("m"))
    // stage 5: the trained-model keep-gate (quality_lr_score's stored
    // LrW weights, ONE feature definition via QualityScorer) — the doc
    // payload rides the carry seam, so the gate is map-only: score,
    // filter keep, drop the model columns. No join-back.
    val w = s.range(1).select(
      lit(Extra6.LrW(0)).as("w0"), lit(Extra6.LrW(1)).as("w1"),
      lit(Extra6.LrW(2)).as("w2"), lit(Extra6.LrW(3)).as("w3"))
    val kept2 = graft.operators.QualityScorer
      .score(kept1, w, carry = Seq("source", "n_chars", "ch", "ntok", "m"))
      .filter(col("keep") === 1L)
      .select(col("doc_id"), col("source"), col("n_chars"), col("ch"),
        col("ntok"), col("m"))
    // stage 6: temperature-weighted greedy (source, md5-shard) budget
    // fill over the model-approved survivors (sample_mix_plan's logic,
    // same 1e-6 Z snap, same MixShards fill)
    val per = kept2.groupBy(col("source"))
      .agg(sum(col("ntok")).cast("long").as("n_tokens"))
    val grand = per.agg(sum(col("n_tokens")).as("grand"))
    val norm = per.crossJoin(broadcast(grand))
      .agg(sum(pow(col("n_tokens") / col("grand").cast("double"),
             Extra6.MixAlpha)).as("z"),
           max(col("grand")).as("grand"))
    val pT = round(
      pow(col("n_tokens") / col("grand").cast("double"), Extra6.MixAlpha)
        / col("z"), 6)
    val targets = per.crossJoin(broadcast(norm))
      .select(col("source"),
        (pT * col("grand") * Extra6.MixBudgetFrac).as("target_tokens"))
    val cumW = Window
      .partitionBy(col("source"), substring(col("m"), 1, 1))
      .orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sel = kept2
      .withColumn("cum_before",
        coalesce(sum(col("ntok")).over(cumW), lit(0L)))
      .join(broadcast(targets), "source")
      .filter(col("cum_before") < col("target_tokens") / Extra6.MixShards)
    // stage 7: the 16-shard export manifest (export_shards' logic)
    try sel
      .select(substring(col("m"), 1, 1).as("shard"), col("ntok"),
        col("n_chars"),
        conv(substring(col("ch"), 1, 12), 16, 10).cast("long").as("hk"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).cast("long").as("total_tokens"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("hk")).as("min_key"), max(col("hk")).as("max_key"),
        sum(col("hk")).cast("long").as("checksum"))
      .orderBy(col("shard"))
      .localCheckpoint()
    finally { scored.unpersist(false); () }
  }

  /** The dynamic-shard mixture plan over a prepared
    * (doc_id, source, ntok, m) relation — the seam Extra7Spec's
    * synthetic level-2/3 fixtures drive directly (the registered query
    * prepares docTok from the documents table). Logic is
    * sample_mix_plan's with ONE change: the fill-shard count per source
    * is 16^plen with plen from the source's exact integer token mass
    * ([[DynShardTokens]]), instead of a fixed 16.
    */
  private[graft] def mixPlanDynamic(docTok: DataFrame): DataFrame = {
    val per = docTok.groupBy(col("source"))
      .agg(sum(col("ntok")).cast("long").as("n_tokens"))
    val grand = per.agg(sum(col("n_tokens")).as("grand"))
    val norm = per.crossJoin(broadcast(grand))
      .agg(sum(pow(col("n_tokens") / col("grand").cast("double"),
             Extra6.MixAlpha)).as("z"),
           max(col("grand")).as("grand"))
    val pT = round(
      pow(col("n_tokens") / col("grand").cast("double"), Extra6.MixAlpha)
        / col("z"), 6)
    // plen and n_shards both derive from the same exact-integer
    // thresholds — grid-deterministic cross-engine by construction
    val plen = when(col("n_tokens") >= lit(256L * DynShardTokens), 3)
      .when(col("n_tokens") >= lit(16L * DynShardTokens), 2)
      .otherwise(1)
    val nShards = when(col("n_tokens") >= lit(256L * DynShardTokens), 4096L)
      .when(col("n_tokens") >= lit(16L * DynShardTokens), 256L)
      .otherwise(16L)
    val targets = per.crossJoin(broadcast(norm))
      .select(col("source"), pT.as("p_temp"),
        (pT * col("grand") * Extra6.MixBudgetFrac).as("target_tokens"),
        plen.as("plen"), nShards.as("n_shards"))
    // targets (with plen) join BEFORE the window — the fill partition
    // key depends on the per-source prefix length; still a broadcast
    val cum = Window
      .partitionBy(col("source"), expr("substring(m, 1, plen)"))
      .orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val kept = col("cum_before") < col("target_tokens") / col("n_shards")
    docTok.join(broadcast(targets), "source")
      .withColumn("cum_before",
        coalesce(sum(col("ntok")).over(cum), lit(0L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).cast("long").as("total_tokens"),
        round(max(col("p_temp")), 6).as("p_temp"),
        round(max(col("target_tokens")), 4).as("target_tokens"),
        max(col("n_shards")).as("n_shards"),
        count(when(kept, 1)).as("kept_docs"),
        sum(when(kept, col("ntok")).otherwise(lit(0L))).cast("long")
          .as("kept_tokens"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    // -- dynamic-shard temperature mixture plan ------------------------------
    // sample_mix_plan with the round-13 shard dial: MixShards = 16 was
    // a fixed fan-out, which serializes a dominant source through 16
    // tasks at 100 TB; here each source's greedy fill runs across
    // 16^plen md5-prefix shards with plen growing with its token mass.
    // Fixture-sized sources take the ELSE branch and reproduce the
    // static plan exactly (Extra7Spec pins the identity); the /tmp
    // scale dials cross the level-2 threshold for real.
    "sample_mix_dynamic" -> { (s, dir) =>
      val docTok = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          size(toks(lower(col("text")))).cast("long").as("ntok"))
        .withColumn("m", md5(col("doc_id").cast("string")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try mixPlanDynamic(docTok).localCheckpoint()
      finally { docTok.unpersist(false); () }
    },

    // -- the production pipeline, end to end ---------------------------------
    // clean → exact dedup → NEAR-DUP dedup (pair graph + CC, canonical
    // survives) → exact percentile prune → MODEL keep-gate → temperature
    // mix → shard manifest. Each stage is the registered operator's
    // exact logic and constants (dedup_doc_exact tie-break,
    // dedup_cluster's jac ≥ 0.6 pair rule + min-id canonical,
    // corpus_prune's [P5,P95] histogram band, quality_lr_score's stored
    // LrW model, sample_mix_plan's snapped temperature fill,
    // export_shards' manifest).
    "pipeline_end2end_full" -> { (s, dir) =>
      // stage 1+2: clean + exact content dedup ([[canonDocs]]). canon
      // feeds THREE consumers (shingles, prune scoring, the quality
      // gate input rides along) → persist + try/finally release after
      // the eager checkpoint.
      val canon = canonDocs(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
      // stage 3: near-dup dedup over the exact-dedup survivors — the
      // dedup_cluster pipeline (LlmOps shingle tokenization, jac ≥ 0.6
      // on the UNROUNDED-int ratio rounded to 6, CC min-label, cluster
      // canonical = min doc_id). Shingles feed two consumers (sizes +
      // self-join) → persist; CC materializes eagerly (per-round
      // localCheckpoint), after which sh is released.
      val sh = shinglesOf(canon).persist(StorageLevel.MEMORY_AND_DISK)
      val labels =
        try graft.operators.ConnectedComponents.components(
          jaccardPairs(sh, 0.6))
        finally { sh.unpersist(false); () }
      // non-canonical cluster members drop; docs in no cluster survive
      // (left_anti against the node-sized drop list — AQE broadcasts it)
      val dropNd = labels.filter(col("v") =!= col("c"))
        .select(col("v").as("doc_id"))
      val keepNd = canon.join(dropNd, Seq("doc_id"), "left_anti")
      // stages 4–7: the shared tail ([[pipelineTail]] — prune → model
      // gate → mix → manifest)
      try pipelineTail(keepNd)
      finally { canon.unpersist(false); () }
    },

    // -- per-node triangle counts --------------------------------------------
    // The standard companion to PageRank/CC (both label-propagation
    // shaped): local clustering structure via exhaustive triangle
    // enumeration over the part co-purchase graph (edge = two parts
    // appeared in the same order — the market-basket projection; at
    // sf0.1 it is genuinely SPARSE: 1.2M edges over 20k nodes, 1.9M
    // triangles. The supplier projection was rejected measured: the
    // small supplier pool makes it near-COMPLETE — C(n,2) edges even
    // at co-order weight ≥ 3 — so exhaustive enumeration there is
    // output-bound by construction, ~n³/6 triangles measuring fixture
    // density, not the operator). The ordered-edge form: undirected
    // edges stored once as (a < b); a triangle {a<b<c} is found exactly
    // once as e1(a,b) ⋈ e2(b,c) on the shared middle node ⋈ the closing
    // edge e3(a,c) — two plain equi hash joins, DuckDB-oracle-checkable,
    // no BNL anywhere. Scale shape: the wedge join's fan-out per node is
    // its ordered out-degree; the id-ordered orientation is the oracle
    // contract (deterministic cross-engine), and under adversarial
    // degree skew the classic refinement — orient each edge toward the
    // higher-(degree, id) endpoint, bounding out-degrees by O(√m)
    // (Schank & Wagner 2005 "forward" algorithm) — changes only the
    // edge relation, not the joins, and yields the SAME per-node counts
    // (enumeration is exhaustive under any total orientation). Pair
    // blowup per order is bounded by order size (≤ 7 lineitems in this
    // schema; the same per-container bound the shingle bucket cap
    // prices elsewhere).
    "graph_triangles" -> { (s, dir) =>
      // edges feed three join sides → persist once ([[coPurchaseEdges]]),
      // release after the eager checkpoint
      val e = coPurchaseEdges(s, dir)
      // the operator does the enumeration (SHUFFLE_HASH wedge
      // streaming — the round-14 capstone lesson — and the map-side-
      // combined count live there; [[graft.operators.Triangles]]).
      // Round-15 (verdict #2): the registered query now ENUMERATES
      // under the degree orientation — priced on the real graph, the
      // wedge mass drops 1.195× at every dial (9.97 G → 8.34 G rows at
      // 100×) and the disk-bandwidth-bound 100× enumeration follows it
      // almost 1:1 (585.3 → 472.6 s measured); the two node-sized
      // orientation joins cost ~0.5 s at sf0.1 (a small close-lane
      // regression bought for the 19% capstone win). Counts are
      // orientation-INDEPENDENT (TrianglesSpec pins id ≡ degree), so
      // the SAME oracle hash passes — the oracle keeps the plain
      // id-ordered SQL.
      val oriented = graft.operators.Triangles.orientByDegree(e)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // Round-19 (guide §3.2): Bloom-prune the wedge stream against the
      // closing-edge key set before its exchange — the count below
      // materializes the persisted orientation (paid anyway) and sizes
      // the filter; output is identical (the closing join verifies
      // every candidate), plan-diffed in plans/r19.
      try graft.operators.Triangles.perNodeCountsPruned(oriented,
          oriented.count())
        .orderBy(col("node"))
        .localCheckpoint()
      finally { oriented.unpersist(false); e.unpersist(false); () }
    },

    // -- core number per node (iterative peel) -------------------------------
    // The third graph discipline (round-15 verdict #4) next to
    // label-propagation (CC/PageRank) and enumeration (Triangles):
    // k-core, via the h-index fixed point (estimates seed at degree and
    // monotonically decrease to the core number —
    // [[graft.operators.KCore]]). The REGISTERED query is the
    // graph_pagerank contract shape: a FIXED number of refinement steps
    // ([[KCoreSteps]] — one fully lazy chained plan, a single job, no
    // driver loop), deterministic and cross-engine checkable; the
    // run-to-convergence form is `KCore.coreNumbers` (spec-proven equal
    // to an independent sequential peel on the real fixture), kept off
    // the bench contract because a ~38-dependent-step fixed point is
    // latency-bound by construction (PERF.md round-15: flat ~1 s per
    // global step at sf0.1 — per-step ACTION overhead and exchange
    // barriers, not row volume; the frontier-pruned variant was
    // measured and REJECTED, one hop of this degree-120 graph covers
    // half the nodes and the frontier regrows in waves). Oracle: the
    // SAME 8 steps as a bounded-round RECURSIVE CTE (the dedup_cluster
    // precedent) — both sides run the identical refinement count, so
    // the hash can only match when every step matches.
    "graph_kcore" -> { (s, dir) =>
      // the adjacency feeds the degree seed + every refinement step —
      // persist the SYMMETRIZED adjacency itself (round-18, the
      // graph_ppr pattern): with the per-step state join now an
      // explicit broadcast, nothing re-materializes the adjacency
      // between steps, so an unpersisted union would re-derive it from
      // the edge blocks five times; released after the eager checkpoint.
      // Round-19 (guide §2.4, the graph_pagerank zero-per-round-
      // exchange pattern): persist PRE-PARTITIONED BY v — each h-index
      // step's (v, nc) pre-count, (v) cumulative window, and (v) max
      // all cluster on v, and the state join is a broadcast that
      // preserves the stream side's partitioning, so EVERY per-step
      // exchange (2 × KCoreSteps before, plans/r19) rides the one
      // up-front adjacency shuffle instead.
      val e = coPurchaseEdges(s, dir)
      val adj = e.select(col("a").as("v"), col("b").as("n"))
        .unionAll(e.select(col("b").as("v"), col("a").as("n")))
        .repartition(col("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try graft.operators.KCore.coreEstimateOnAdj(adj, steps = KCoreSteps)
        .orderBy(col("node"))
        .localCheckpoint()
      finally { adj.unpersist(false); e.unpersist(false); () }
    },

    // -- multi-source hop distance (frontier expansion) -----------------------
    // The fourth graph discipline next to label-propagation
    // (CC/PageRank), enumeration (Triangles) and the k-core peel:
    // BFS, whose per-round state GROWS hop by hop then saturates (the
    // inverse of the peel's shrink). Sources = the p_size = 50 parts
    // (a deterministic data-derived seed set, ~2% of the catalogue);
    // distance = shortest hop count to any seed through the part
    // co-purchase graph, bounded at [[BfsHops]] levels — the
    // graph_pagerank / graph_kcore contract shape: a FIXED iteration,
    // one lazy chained plan, mirrored step-for-step by a bounded
    // recursive CTE with UNION-distinct semantics (the level-set form;
    // see [[graft.operators.Bfs]] for why min-over-levels beats the
    // textbook visited-set anti-join in a lazily chained plan).
    "graph_bfs" -> { (s, dir) =>
      // persist the SYMMETRIZED adjacency, not just the edges (round-18,
      // the graph_ppr pattern): the hop joins now broadcast the frontier
      // explicitly, so no shuffle materializes the adjacency between
      // hops — an unpersisted union would re-derive it per hop; released
      // after the eager checkpoint. Round-19 (guide §2.4, the
      // graph_pagerank pattern): PRE-PARTITIONED BY v — the hop join
      // probes the frontier against n and keeps v (symmetric adjacency,
      // same level sets), so each level's distinct rides this
      // partitioning with no per-hop exchange (plans/r19).
      val e = coPurchaseEdges(s, dir)
      val adj = e.select(col("a").as("v"), col("b").as("n"))
        .unionAll(e.select(col("b").as("v"), col("a").as("n")))
        .repartition(col("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try graft.operators.Bfs.hopDistancesOnAdj(adj, seedParts(s, dir),
          maxHops = BfsHops)
        .orderBy(col("node"))
        .localCheckpoint()
      finally { adj.unpersist(false); e.unpersist(false); () }
    },

    // -- semi-supervised label propagation (categorical diffusion) -----------
    // The sixth graph discipline: per-round state is a LABEL column
    // and the update is a deterministic mode vote (weight DESC, label
    // ASC), not an arithmetic fold. Seeds = the p_size=50 parts (the
    // graph_bfs/graph_sssp source set) labeled by brand; the clamp is
    // folded into the vote via a ClampWeight self-loop so each round
    // is one join + one map-side-combined weight sum + one window rank
    // and the oracle's recursive CTE references the iteration exactly
    // once ([[graft.operators.LabelProp]]).
    "graph_labelprop" -> { (s, dir) =>
      // persist the EDGES only and let the vote rounds run node-keyed
      // shuffle joins (round-18 A/B, full close lane: the forced
      // per-round state broadcast + symmetrized-adjacency persist read
      // equal here and 40% SLOWER on the shared-operator
      // graph_labelprop_idx row — the rounds' identical adjacency
      // exchange is planned once and REUSED, so the broadcast saves no
      // edge movement; see LabelProp.propagateOnAdj)
      val e = coPurchaseEdges(s, dir)
      val seeds = Tables(s, dir, "part")
        .filter(col("p_size") === 50)
        .select(col("p_partkey").as("v"), col("p_brand").as("label"))
      try graft.operators.LabelProp.propagate(e, seeds, rounds = LpRounds)
        .orderBy(col("node"))
        .localCheckpoint()
      finally { e.unpersist(false); () }
    },

    // -- weighted shortest path (bounded Bellman-Ford) ------------------------
    // graph_bfs's weighted sibling: cheapest path COST, not hop count —
    // edge weight = co-purchase affinity inverted (w = 8 − min(co, 7)
    // where co = number of orders the two parts share: frequently
    // co-bought parts are "close"), so a cheap two-hop route through a
    // popular pairing must beat an expensive direct edge, the
    // distinction no per-level node dedup can express. Bounded at
    // [[SsspRounds]] relaxation rounds, each ONE join + ONE min-agg
    // over a self-loop-augmented adjacency so the lazy chain stays
    // depth-linear ([[graft.operators.Bfs.weightedDistances]]).
    // Integer weights throughout: exact min arithmetic, no
    // cross-engine float drift on path-cost ties.
    "graph_sssp" -> { (s, dir) =>
      // persist the symmetrized weighted adjacency (round-18, the
      // graph_bfs rule above): the relaxation joins broadcast the state,
      // so the adjacency never materializes via a shuffle — unpersisted,
      // each of the four rounds would re-derive it from the edge blocks
      val e = coPurchaseWeighted(s, dir)
      val sym = e.select(col("a").as("v"), col("b").as("n"), col("w"))
        .unionAll(e.select(col("b").as("v"), col("a").as("n"), col("w")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try graft.operators.Bfs.weightedDistancesOnSym(sym, seedParts(s, dir),
          rounds = SsspRounds)
        .orderBy(col("node"))
        .localCheckpoint()
      finally { sym.unpersist(false); e.unpersist(false); () }
    },

    // -- the production pipeline at 100 TB shape -----------------------------
    // pipeline_end2end_full with ONE change: stage 3's exact shingle
    // self-join (quadratic in the hottest shingle's doc list — the
    // composed query's dominant cost at 100×, and the known
    // scale-killer family at 100 TB) is replaced by MinHash-LSH
    // candidate generation + exact Jaccard verification
    // (MinHash.nearDuplicatesFromText: row-local 64-perm signatures, 16
    // capped band buckets, map-side pair explode — bucketed, never
    // all-pairs; candidates are verified against the exact shingle
    // Jaccard, so precision is EXACT). Stages 1–2 and 4–7 are
    // byte-identical ([[canonDocs]] + [[pipelineTail]]). At the
    // registered threshold (jac ≥ 0.6, 64 hashes × 16 bands) LSH recall
    // is 1 on the driver fixtures — Extra7Spec pins the drop sets equal
    // — so the SAME oracle checks both forms; at unbounded scale the
    // banding bound 1−(1−s⁴)¹⁶ prices the recall honestly (0.89 floor
    // AT the threshold, →1 for the near-identical docs dedup targets).
    "pipeline_end2end_scale" -> { (s, dir) =>
      val canon = canonDocs(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // stage 3, scale form: hashed shingles (the ScaleOps rule:
        // 64-bit keys, never strings, through the candidate machinery),
        // LSH candidates, exact verification. nearDuplicatesFromText
        // manages its own caches and returns an eagerly-materialized
        // pair set.
        val hashed = shinglesOf(canon)
          .select(col("doc_id"), xxhash64(col("s")).as("s")).distinct()
        val pairs = graft.operators.MinHash
          .nearDuplicatesFromText(canon, hashed, threshold = 0.6)
          .select(col("d1").as("src"), col("d2").as("dst"))
        val labels = graft.operators.ConnectedComponents.components(pairs)
        val dropNd = labels.filter(col("v") =!= col("c"))
          .select(col("v").as("doc_id"))
        val keepNd = canon.join(dropNd, Seq("doc_id"), "left_anti")
        pipelineTail(keepNd)
      } finally { canon.unpersist(false); () }
    }
  )

  val oracle: Map[String, String] = Map(
    "sample_mix_dynamic" -> s"""
      WITH dt AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(lower(text), ' '),
                 t -> t <> '')) AS BIGINT) AS ntok,
               md5(CAST(doc_id AS VARCHAR)) AS m
        FROM documents WHERE text IS NOT NULL
      ), per AS (
        SELECT source, CAST(sum(ntok) AS BIGINT) AS n_tokens FROM dt GROUP BY source
      ), tot AS (
        SELECT sum(n_tokens) AS grand,
               sum(pow(n_tokens /
                 CAST((SELECT sum(n_tokens) FROM per) AS DOUBLE),
                 ${Extra6.MixAlpha})) AS z
        FROM per
      ), tgt AS (
        SELECT source,
               round(pow(n_tokens / CAST(grand AS DOUBLE), ${Extra6.MixAlpha}) / z, 6) AS p_temp,
               round(pow(n_tokens / CAST(grand AS DOUBLE), ${Extra6.MixAlpha}) / z, 6)
                 * grand * ${Extra6.MixBudgetFrac} AS target_tokens,
               CASE WHEN n_tokens >= ${256L * DynShardTokens} THEN 3
                    WHEN n_tokens >= ${16L * DynShardTokens} THEN 2
                    ELSE 1 END AS plen,
               CAST(CASE WHEN n_tokens >= ${256L * DynShardTokens} THEN 4096
                         WHEN n_tokens >= ${16L * DynShardTokens} THEN 256
                         ELSE 16 END AS BIGINT) AS n_shards
        FROM per CROSS JOIN tot
      ), c AS (
        SELECT dt.doc_id, dt.source, ntok, p_temp, target_tokens, n_shards,
               COALESCE(SUM(ntok) OVER (PARTITION BY dt.source, substr(m, 1, plen)
                 ORDER BY m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM dt JOIN tgt ON dt.source = tgt.source
      )
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(ntok) AS BIGINT) AS total_tokens,
             round(MAX(p_temp), 6) AS p_temp,
             round(MAX(target_tokens), 4) AS target_tokens,
             MAX(n_shards) AS n_shards,
             COUNT(CASE WHEN cum_before < target_tokens / n_shards THEN 1 END) AS kept_docs,
             CAST(SUM(CASE WHEN cum_before < target_tokens / n_shards
                           THEN ntok ELSE 0 END) AS BIGINT) AS kept_tokens
      FROM c GROUP BY source ORDER BY source
    """,

    "graph_triangles" -> """
      WITH so AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem
      ), e AS (
        SELECT DISTINCT x.sk AS a, y.sk AS b
        FROM so x JOIN so y ON x.ok = y.ok AND x.sk < y.sk
      ), tri AS (
        SELECT e1.a AS u, e1.b AS v, e2.b AS w
        FROM e e1
        JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
      ), nodes AS (
        SELECT u AS node FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri
      )
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM nodes GROUP BY node ORDER BY node
    """,

    // The SAME fixed 8-step h-index refinement as the Spark side (the
    // unrolled-PageRank precedent: both engines run an identical
    // bounded iteration, so the hash can only match step-for-step).
    "graph_kcore" -> s"""
      WITH RECURSIVE so AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem
      ), e AS (
        SELECT DISTINCT x.sk AS a, y.sk AS b
        FROM so x JOIN so y ON x.ok = y.ok AND x.sk < y.sk
      ), adj AS (
        SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e
      ), deg AS (
        SELECT v, COUNT(*) AS c FROM adj GROUP BY v
      ), iter(round, v, c) AS (
        SELECT 0, v, c FROM deg
        UNION ALL
        SELECT round + 1, v, c FROM (
          SELECT t.round, t.v, MAX(LEAST(t.rnk, t.nc)) AS c
          FROM (
            SELECT i.round, adj.v, i.c AS nc,
                   ROW_NUMBER() OVER (PARTITION BY adj.v ORDER BY i.c DESC) AS rnk
            FROM adj JOIN iter i ON adj.n = i.v
          ) t GROUP BY t.round, t.v
        ) WHERE round < $KCoreSteps
      )
      SELECT v AS node, CAST(c AS BIGINT) AS core
      FROM iter WHERE round = $KCoreSteps ORDER BY node
    """,

    // The SAME bounded level expansion as the Spark side: the
    // recursive UNION's distinct-per-(v, d) accumulation is exactly
    // the operator's per-level node dedup (level h = nodes reachable
    // by a walk of exactly h edges), and min(d) per node is the
    // closing aggregate on both engines — the hash can only match
    // when every level matches.
    "graph_bfs" -> s"""
      WITH RECURSIVE so AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem
      ), e AS (
        SELECT DISTINCT x.sk AS a, y.sk AS b
        FROM so x JOIN so y ON x.ok = y.ok AND x.sk < y.sk
      ), adj AS (
        SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e
      ), walk(v, d) AS (
        SELECT p_partkey, 0 FROM part WHERE p_size = 50
        UNION
        SELECT adj.n, walk.d + 1
        FROM walk JOIN adj ON adj.v = walk.v
        WHERE walk.d < $BfsHops
      )
      SELECT v AS node, CAST(MIN(d) AS BIGINT) AS dist
      FROM walk GROUP BY v ORDER BY node
    """,

    // The SAME bounded Bellman-Ford as the Spark side (the graph_kcore
    // oracle shape: an identical fixed relaxation count unrolled in a
    // recursive CTE — the hash can only match round-for-round). The
    // weight-0 self-loops fold the keep-term into the relax-term on
    // both engines, so each recursive step is one join + one grouped
    // MIN, exactly the operator's plan.
    "graph_sssp" -> s"""
      WITH RECURSIVE so AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem
      ), e AS (
        SELECT x.sk AS a, y.sk AS b, 8 - LEAST(count(*), 7) AS w
        FROM so x JOIN so y ON x.ok = y.ok AND x.sk < y.sk
        GROUP BY x.sk, y.sk
      ), sym AS (
        SELECT a AS v, b AS n, w FROM e UNION ALL SELECT b, a, w FROM e
      ), nodes AS (
        SELECT DISTINCT v FROM sym
        UNION SELECT p_partkey FROM part WHERE p_size = 50
      ), adj AS (
        SELECT v, n, w FROM sym
        UNION ALL SELECT v, v, 0 FROM nodes
      ), iter(round, v, d) AS (
        SELECT 0, p_partkey, CAST(0 AS BIGINT) FROM part WHERE p_size = 50
        UNION ALL
        SELECT round + 1, v, d FROM (
          SELECT t.round, t.v, MIN(t.d) AS d
          FROM (
            SELECT i.round, a.n AS v, i.d + a.w AS d
            FROM iter i JOIN adj a ON a.v = i.v
          ) t GROUP BY t.round, t.v
        ) WHERE round < $SsspRounds
      )
      SELECT v AS node, CAST(d AS BIGINT) AS dist
      FROM iter WHERE round = $SsspRounds ORDER BY node
    """,

    // The SAME clamped mode-vote rounds as the Spark side: the
    // ClampWeight self-loop folds the seed clamp into the vote, so the
    // recursive term references the iteration exactly ONCE (recursive
    // CTEs forbid a second reference — the clamp-as-join form is
    // inexpressible here, which is WHY the operator uses this form);
    // ties break (weight DESC, label ASC) on both engines.
    "graph_labelprop" -> s"""
      WITH RECURSIVE so AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem
      ), e AS (
        SELECT DISTINCT x.sk AS a, y.sk AS b
        FROM so x JOIN so y ON x.ok = y.ok AND x.sk < y.sk
      ), seed AS (
        SELECT p_partkey AS v, MIN(p_brand) AS label
        FROM part WHERE p_size = 50 GROUP BY p_partkey
      ), adj AS (
        SELECT a AS v, b AS n, CAST(1 AS BIGINT) AS wt FROM e
        UNION ALL SELECT b, a, 1 FROM e
        UNION ALL SELECT v, v, ${graft.operators.LabelProp.ClampWeight} FROM seed
      ), iter(round, v, label) AS (
        SELECT 0, v, label FROM seed
        UNION ALL
        SELECT round + 1, v, label FROM (
          SELECT t.round, t.v, t.label,
                 ROW_NUMBER() OVER (PARTITION BY t.round, t.v
                                    ORDER BY t.wt DESC, t.label ASC) AS rn
          FROM (
            SELECT i.round, a.n AS v, i.label, SUM(a.wt) AS wt
            FROM iter i JOIN adj a ON a.v = i.v
            GROUP BY i.round, a.n, i.label
          ) t
        ) WHERE rn = 1 AND round < $LpRounds
      )
      SELECT v AS node, label
      FROM iter WHERE round = $LpRounds ORDER BY node
    """,

    // ONE oracle text for BOTH registered pipeline forms: the scale
    // form's stage-3 swap is behavior-preserving at the fixture dial
    // (LSH recall 1 at jac ≥ 0.6 — Extra7Spec pins the drop sets
    // equal), so the exact-CC RECURSIVE CTE checks both. A banding
    // change that loses a fixture pair fails the driver hash, not just
    // the unit spec.
    "pipeline_end2end_scale" -> pipelineFullOracle,
    "pipeline_end2end_full" -> pipelineFullOracle
  )

  private lazy val pipelineFullOracle: String = s"""
      WITH RECURSIVE canon AS (
        SELECT doc_id, source, n_chars, text, ch FROM (
          SELECT doc_id, source, n_chars, text, md5(text) AS ch,
                 row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM documents WHERE text IS NOT NULL
        ) WHERE rn = 1
      ), ctoks AS (
        SELECT doc_id, string_split(lower(text), ' ') t FROM canon
      ), cidx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM ctoks
      ), csh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM cidx
      ), csizes AS (
        SELECT doc_id, COUNT(*) n FROM csh GROUP BY doc_id
      ), cinter AS (
        SELECT a.doc_id d1, b.doc_id d2, COUNT(*) i
        FROM csh a JOIN csh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ), cpairs AS (
        SELECT d1, d2 FROM (
          SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) jac
          FROM cinter JOIN csizes s1 ON d1 = s1.doc_id
                      JOIN csizes s2 ON d2 = s2.doc_id)
        WHERE jac >= 0.6
      ), cedges AS (
        SELECT d1 v1, d2 v2 FROM cpairs UNION ALL SELECT d2, d1 FROM cpairs
      ), cverts AS (
        SELECT DISTINCT v1 AS v FROM cedges
      ), reach(v, r) AS (
        SELECT v, v FROM cverts
        UNION
        SELECT e.v1, reach.r FROM cedges e JOIN reach ON e.v2 = reach.v
      ), dropnd AS (
        SELECT v AS doc_id FROM reach GROUP BY v HAVING v <> MIN(r)
      ), keepnd AS (
        SELECT c.* FROM canon c
        WHERE NOT EXISTS (SELECT 1 FROM dropnd d WHERE d.doc_id = c.doc_id)
      ), scored AS (
        SELECT doc_id, source, n_chars, ch, text, ntok,
               round(CAST(n_chars AS DOUBLE) / ntok, 4) AS score,
               md5(CAST(doc_id AS VARCHAR)) AS m
        FROM (
          SELECT *, len(list_filter(string_split(text, ' '), t -> t <> '')) AS ntok
          FROM keepnd
        ) WHERE ntok > 0
      ), hist AS (
        SELECT score, count(*) AS c FROM scored GROUP BY score
      ), cum AS (
        SELECT score, sum(c) OVER (ORDER BY score) AS cum,
               (SELECT sum(c) FROM hist) AS n
        FROM hist
      ), thr AS (
        SELECT min(CASE WHEN cum >= ceil(${Extra5.PruneLoQ} * n) THEN score END) AS lo,
               min(CASE WHEN cum >= ceil(${Extra5.PruneHiQ} * n) THEN score END) AS hi
        FROM cum
      ), kept1 AS (
        SELECT doc_id, source, n_chars, ch, text, ntok, m
        FROM scored, thr WHERE score >= lo AND score <= hi
      ), qf AS (
        SELECT doc_id,
               len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS qtok,
               CAST(list_sum(list_transform(
                 list_filter(string_split(lower(text), ' '), t -> t <> ''),
                 t -> length(t))) AS DOUBLE) AS wls,
               CAST(len(list_filter(string_split(lower(text), ' '),
                 t -> length(t) >= 5)) AS DOUBLE) AS nl
        FROM kept1
      ), qkeep AS (
        SELECT doc_id FROM qf
        WHERE ${Extra6.LrW(0)} + ${Extra6.LrW(1)} * ((qtok - 50) / 50.0)
              + ${Extra6.LrW(2)} * (wls / qtok - 4.5)
              + ${Extra6.LrW(3)} * (nl / qtok - 0.5) >= 0
      ), kept2 AS (
        SELECT k.doc_id, source, n_chars, ch, ntok, m
        FROM kept1 k JOIN qkeep q ON k.doc_id = q.doc_id
      ), per AS (
        SELECT source, CAST(sum(ntok) AS BIGINT) AS n_tokens
        FROM kept2 GROUP BY source
      ), tot AS (
        SELECT sum(n_tokens) AS grand,
               sum(pow(n_tokens /
                 CAST((SELECT sum(n_tokens) FROM per) AS DOUBLE),
                 ${Extra6.MixAlpha})) AS z
        FROM per
      ), tgt AS (
        SELECT source,
               round(pow(n_tokens / CAST(grand AS DOUBLE), ${Extra6.MixAlpha}) / z, 6)
                 * grand * ${Extra6.MixBudgetFrac} AS target_tokens
        FROM per CROSS JOIN tot
      ), fill AS (
        SELECT k.*,
               COALESCE(SUM(ntok) OVER (PARTITION BY source, substr(m, 1, 1)
                 ORDER BY m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM kept2 k
      ), sel AS (
        SELECT f.* FROM fill f JOIN tgt t ON f.source = t.source
        WHERE cum_before < target_tokens / ${Extra6.MixShards}
      )
      SELECT substr(m, 1, 1) AS shard,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS total_tokens,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             min(hk) AS min_key, max(hk) AS max_key,
             CAST(sum(hk) AS BIGINT) AS checksum
      FROM (SELECT m, ntok, n_chars,
              CAST('0x' || substr(ch, 1, 12) AS BIGINT) AS hk FROM sel)
      GROUP BY shard ORDER BY shard
    """
}
