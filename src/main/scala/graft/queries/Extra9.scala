package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bfs, Graphs, KCore, LabelProp, Triangles}

/** Round-16 operators. The reference (/root/reference/task.ts) has no
  * analogue; this is engine surface for the brief's extension menu:
  *
  *   - the steady-state `graph_*_idx` serving rows (round-15 verdict
  *     #1, the round's one `weak`): every `graph_*` sibling rebuilds
  *     the co-purchase edge relation + symmetrized adjacency + degrees
  *     from lineitem per call — the honest one-shot cost, and per
  *     PERF.md's scale100 attribution the DOMINANT cost for bfs and
  *     linkpred. These rows serve the same operators, same dials, same
  *     results (oracle-identical — they share the siblings' SQL) from
  *     the [[graft.operators.Graphs]] session cache, so the bench's
  *     min-of-2 prices the amortized serving cost next to the
  *     sibling's build-included cost, exactly as `sim_*_idx` does for
  *     the similarity family.
  */
object Extra9 {
  type Q = (SparkSession, String) => DataFrame

  /** text_bpe_train's merge budget: 8 rounds exercise the full greedy
    * machinery (single-char pairs, then merged-symbol pairs from round
    * 2 on) while the unrolled oracle stays ~60 CTEs. A real tokenizer
    * run sets this to 30k–100k; the round count scales the driver loop
    * linearly and nothing else.
    */
  val BpeMerges = 8

  /** graph_ppr's restart probability — the conventional 0.15 (the
    * graph_pagerank damping's complement, written as the restart mass
    * so the diffusion form reads off the paper).
    */
  val PprAlpha = 0.15

  /** graph_ppr's fixed round count (the PrIters discipline: a bounded,
    * deterministic, cross-engine-checkable iteration; 4 rounds leave a
    * visible diffusion gradient — 1–2 hops dominate, 3–4 differentiate
    * wedge-rich regions — while each round stays one join + one fan +
    * one combined sum).
    */
  val PprIters = 4

  /** The graph family's shared cache tag: one co-purchase graph frame
    * per data directory (the SimIndexes `#raw`/`#unit` rule — the tag
    * names the FRAME, and every `_idx` row below uses this same edge
    * definition, so they legitimately share one entry).
    */
  private[graft] def tag(dir: String) = s"copurchase|$dir"

  /** The graph `_idx` rows' lookup: memo → committed parquet artifact →
    * build(+save back) — round-17 verdict #2. r17 measured the
    * artifact-served graph as the FASTEST bfs row in mixed sweeps
    * (3.07 s vs 4.22 `_idx` / 5.29 build-included; 37.5 vs 69.8/90.7
    * at scale100): artifact-backed blocks evict to a cheap parquet
    * re-scan instead of competing with every other cached frame for
    * block-manager memory, so serving from the committed artifact is
    * now the DEFAULT `_idx` path, with the build (then save, so the
    * next driver loads) only on a true cold start.
    */
  private[queries] def artifactDir(s: SparkSession, dir: String): Option[String] =
    Some(s"${Extra10.artifactBase(s, dir)}/graph")

  private def graph(s: SparkSession, dir: String): Graphs.GraphIndex =
    Graphs.index(Extra7.coPurchaseEdgesPlan(s, dir), tag(dir), s,
      artifact = artifactDir(s, dir))

  /** Personalized PageRank from the graph family's shared seed set —
    * the DIFFUSION serving shape completing graph_linkpred's structural
    * one (round-15 verdict #4): random-walk-with-restart mass from the
    * p_size=50 parts over the co-purchase graph. r₀ = 1/|S| on each
    * seed; each round r_k(v) = Σ over contributions
    * [(1−α)·r_{k−1}(u)/deg(u) for u→v] ∪ [α/|S| for v ∈ S] — the
    * restart term rides the SAME per-round aggregate as the walk mass
    * (a union row source, not a second state reference), so each round
    * is one node-sized contribution join + one edge fan + one map-side-
    * combined sum, the state is referenced exactly once (the kcore
    * h(x)-once discipline), and [[PprIters]] rounds chain into one lazy
    * depth-linear plan. Per-round round(·,10) is the graph_pagerank
    * float-determinism rule. Sparse representation: a node no walk has
    * reached holds no row (mass 0), exactly as the oracle's unrolled
    * GROUP BY produces. A seed OUTSIDE the edge relation keeps its
    * restart mass but fans nothing out (no degree row) — defined,
    * deterministic, mirrored in SQL. Output: top 50 by (ppr DESC, node)
    * — the serving shape ("expand from THESE items"), totally ordered.
    */
  private def pprTopK(adj: DataFrame, deg: DataFrame,
                      seeds: DataFrame): DataFrame = {
    val nSeeds = seeds.count() // the ONLY driver-side value (pagerank rule)
    // fail loudly, not Infinity/NaN restart mass (ADVICE r16): an empty
    // seed set means the fixture/dir no longer yields the seed relation
    require(nSeeds > 0,
      s"pprTopK: empty seed set — restart mass 1/|S| is undefined")
    val restart = seeds.select(col("seed").as("node"),
      lit(PprAlpha / nSeeds).as("c"))
    var ranks = seeds.select(col("seed").as("node"),
      round(lit(1.0 / nSeeds), 10).as("pr"))
    for (_ <- 1 to PprIters) {
      // contribution weight per SOURCE first (node-sized join), then one
      // edge join fans it out — never pr/deg per edge twice (the
      // graph_pagerank shape). w is broadcast via Hints.nodeState
      // (guide §3.1, the Bfs/KCore broadcastState rule): its
      // post-aggregation size estimate otherwise makes the initial plan
      // shuffle the ADJACENCY per round, and AQE's runtime broadcast
      // conversion lands only after that exchange has run (plans/r18: 4
      // adjacency-sized exchanges in graph_ppr_idx before the fix). The
      // conf escape (round-19, verdict #2) is the billion-node form.
      val w = ranks.join(deg, ranks("node") === deg("v"))
        .select(col("node"), (lit(1.0 - PprAlpha) * col("pr") / col("d")).as("w"))
      val fan = adj.join(graft.operators.Hints.nodeState(w),
          adj("v") === w("node"))
        .select(adj("n").as("node"), col("w").as("c"))
      ranks = fan.unionAll(restart)
        .groupBy(col("node"))
        .agg(round(sum(col("c")), 10).as("ppr"))
        .select(col("node"), col("ppr").as("pr"))
    }
    ranks.select(col("node"), col("pr").as("ppr"))
      .orderBy(col("ppr").desc, col("node"))
      .limit(50)
  }

  val queries: Map[String, Q] = Map(
    // -- steady-state graph serving (prebuilt edges/adjacency/degrees) ----
    // Same operators and dials as the build-included siblings
    // (graph_triangles/kcore/bfs/sssp/labelprop/linkpred in Extra7 and
    // Extra8), same oracle SQL, same results — but the graph comes from
    // the Graphs session cache: built + persisted on first call, reused
    // after, so a steady-state query times only its own enumeration /
    // refinement / traversal. No per-call unpersist: the cache owns the
    // frames ([[graft.operators.Graphs.clear]] is the release seam).
    "graph_triangles_idx" -> { (s, dir) =>
      // the cached orientation is derived from the cached degree table,
      // so the wedge stream starts immediately — the two node-sized
      // orientation joins the sibling pays per call are build-time here.
      // Round-19 (guide §3.2): Bloom-prune the wedge stream against the
      // closing-edge keys; the sizing count is one cached-scan job.
      val o = graph(s, dir).oriented
      Triangles.perNodeCountsPruned(o, o.count())
        .orderBy(col("node"))
    },

    "graph_kcore_idx" -> { (s, dir) =>
      val g = graph(s, dir)
      // the cached degree table seeds the h-index directly (deg0) — the
      // sibling's seed aggregation over the adjacency is build-time here
      KCore.coreEstimateOnAdj(g.adj, steps = Extra7.KCoreSteps,
          deg0 = Some(g.deg))
        .orderBy(col("node"))
    },

    "graph_bfs_idx" -> { (s, dir) =>
      Bfs.hopDistancesOnAdj(graph(s, dir).adj, Extra7.seedParts(s, dir),
          maxHops = Extra7.BfsHops)
        .orderBy(col("node"))
    },

    "graph_sssp_idx" -> { (s, dir) =>
      val wg = Graphs.weighted(Extra7.coPurchaseWeightedPlan(s, dir),
        tag(dir), s, artifact = artifactDir(s, dir))
      Bfs.weightedDistancesOnSym(wg.sym, Extra7.seedParts(s, dir),
          rounds = Extra7.SsspRounds)
        .orderBy(col("node"))
    },

    "graph_labelprop_idx" -> { (s, dir) =>
      val seeds = Tables(s, dir, "part")
        .filter(col("p_size") === 50)
        .select(col("p_partkey").as("v"), col("p_brand").as("label"))
      LabelProp.propagateOnAdj(graph(s, dir).adj, seeds,
          rounds = Extra7.LpRounds)
        .orderBy(col("node"))
    },

    "graph_linkpred_idx" -> { (s, dir) =>
      val g = graph(s, dir)
      val seeds = Tables(s, dir, "part")
        .filter(col("p_size") === 50)
        .select(col("p_partkey").as("seed"))
      Extra8.linkpredTopK(g.adj, g.deg, seeds)
        .orderBy(col("seed"), col("rn"))
    },

    // -- personalized PageRank (random walk with restart) -----------------
    // The eighth graph discipline and graph_linkpred's serving twin:
    // linkpred ranks STRUCTURAL candidates (shared-neighbour Jaccard,
    // 2-hop horizon); PPR ranks by DIFFUSION mass (multi-hop, damped),
    // the other standard "expand from these items" primitive. Fixed
    // [[PprIters]] rounds (the pagerank/kcore contract), restart mass
    // folded into each round's aggregate as a union row source so the
    // state is referenced once and the oracle's unrolled CTE mirrors it
    // term for term. See [[pprTopK]].
    "graph_ppr" -> { (s, dir) =>
      val e = Extra7.coPurchaseEdges(s, dir)
      // adjacency feeds one fan join per round + the degree seed →
      // persist; eager localCheckpoint lets the finally release both
      val adj = e.select(col("a").as("v"), col("b").as("n"))
        .unionAll(e.select(col("b").as("v"), col("a").as("n")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val deg = adj.groupBy(col("v")).agg(count(lit(1)).as("d"))
        pprTopK(adj, deg, Extra7.seedParts(s, dir).select(col("v").as("seed")))
          .localCheckpoint()
      } finally { adj.unpersist(false); e.unpersist(false); () }
    },

    // the steady-state sibling: same rounds, same dials, same oracle —
    // adjacency + degrees from the session cache
    "graph_ppr_idx" -> { (s, dir) =>
      val g = graph(s, dir)
      pprTopK(g.adj, g.deg, Extra7.seedParts(s, dir).select(col("v").as("seed")))
    },

    // -- SCD2 late-data correction (round-15 verdict #7) -------------------
    // merge_scd2 assumes the change stream is COMPLETE; real CDC isn't —
    // a late event lands MID-history, splits an existing validity range,
    // and renumbers every later version of its entity. This query runs
    // the out-of-order re-versioning path: events are deterministically
    // split into the on-time stream (which builds the prior dimension)
    // and a late batch (event_id ≡ 7 mod 10, ~10% of events —
    // arbitrary-but-fixed, so the incremental path faces real mid-range
    // splits on the fixture), then `Merge.scd2ApplyLate` corrects ONLY
    // the affected entities (full-history re-window, entity-keyed
    // semi-join) while untouched entities pass through an anti-join.
    // Oracle = the full rebuild over the UNION (merge_scd2's SQL
    // verbatim): the incremental correction must be indistinguishable
    // from recomputing everything — the only honest contract for a
    // correction path.
    "merge_scd2_late" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val isLate = pmod(col("event_id"), lit(10)) === 7
      val dim = graft.operators.Merge.scd2Dim(ev.filter(!isLate))
      graft.operators.Merge.scd2ApplyLate(dim, ev, ev.filter(isLate))
        .orderBy(col("user_id"), col("version"))
    },

    // -- hybrid retrieval: BM25 ⊕ dense cosine via reciprocal-rank fusion --
    // The serving composition every retrieval stack runs (Cormack,
    // Clarke & Büttcher 2009: RRF dominates either list alone): for
    // each query doc (the sim_topk qid < 10 rule; its OWN tokens are
    // the lexical query, its OWN embedding the dense query — the
    // doc-as-query shape of dedup-adjacent retrieval), fuse the
    // lexical top-20 (Okapi BM25, text_bm25's constants and rounding)
    // with the dense top-20 (rounded cosine, sim_topk's convention) by
    // rrf = Σ 1/(60 + rank), missing-from-a-list contributing 0. Fusion
    // is arithmetic over INTEGER ranks — exactly oracle-checkable where
    // score-level fusion would compound float drift. Scale shape: the
    // query side is tiny and broadcasts everywhere; the corpus pays one
    // token pass (postings pruned to the query-term union BEFORE the tf
    // aggregate) and one brute cosine pass (the bounded-slice baseline —
    // sim_ann is the unbounded dense path); both lists cap at 20 under
    // WindowGroupLimit, and the fuse join moves ≤ 40 rows per query.
    "search_hybrid_rrf" -> { (s, dir) =>
      // the dense leg: the bounded brute-cosine baseline (sim_topk's
      // convention) — search_hybrid_rrf_idx (Extra10) swaps in the
      // served ANN index through the same fusion body
      searchHybrid(s, dir, n => {
        val q = broadcast(n.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("e").as("qe")))
        val wd = Window.partitionBy(col("qid"))
          .orderBy(col("c").desc, col("vec_id").asc)
        q.join(n, col("vec_id") =!= col("qid"))
          .withColumn("c",
            round(graft.functions.CosineSimilarity(col("qe"), col("e")), 5))
          .withColumn("drank", row_number().over(wd))
          .filter(col("drank") <= 20)
          .select(col("qid"), col("vec_id").as("doc_id"), col("drank"))
      })
    },

    // -- point-in-time lookup against the SCD2 dimension -------------------
    // The reason a type-2 dimension EXISTS: "what state was this entity
    // in at time T?" — the gapless half-open ranges merge_scd2 builds
    // are exactly what makes this lookup exact and unique. Probes = a
    // deterministic 20% event sample shifted +10 s (mid-range points,
    // so the lookup exercises interior ranges, not just run starts);
    // each probe finds THE version whose [valid_from, valid_to) covers
    // it. Scale shape: an entity-keyed equi join with the range
    // predicate as residual — per-entity version counts are bounded, so
    // the fan-out is versions-per-user, never a cross product (no
    // binning needed; contrast join_range's bin machinery, which exists
    // for UNKEYED ranges).
    "merge_scd2_asof" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val dim = graft.operators.Merge.scd2Dim(ev)
        .select(col("user_id").as("du"), col("version"), col("state"),
          col("valid_from"), col("valid_to"))
      val probes = ev.filter(pmod(col("event_id"), lit(5)) === 0)
        .select(col("user_id"), col("event_id"),
          (col("ts") + expr("INTERVAL 10 SECONDS")).as("pts"))
      probes.join(dim,
          col("user_id") === col("du") &&
            col("valid_from") <= col("pts") &&
            (col("valid_to").isNull || col("pts") < col("valid_to")),
          "left")
        .select(col("user_id"), col("event_id"), col("pts"),
          col("version"), col("state"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // -- BPE tokenizer-merge training --------------------------------------
    // The engine could COUNT BPE-ish units (text_tokens) but not LEARN
    // merges — the one standard tokenizer-training stage the LLM
    // pipeline surface was missing (round-15 verdict #2). Corpus →
    // distinct-word frequency table (the corpus-sized pass; everything
    // after is vocab-sized) → [[BpeMerges]] greedy rounds with the
    // deterministic (count DESC, pair ASC) tie-break; output = the
    // learned merge table, the artifact a tokenizer ships. Oracle = the
    // SAME rounds unrolled as plain CTE stages, so the driver hash pins
    // every round's pair counts, tie-break, and greedy overlap
    // resolution ([[graft.operators.BpeTrain]]).
    "text_bpe_train" -> { (s, dir) =>
      val words = Tables(s, dir, "documents")
        .select(explode(filter(split(lower(col("text")), " "),
          (t: Column) => t =!= "")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      graft.operators.BpeTrain.trainMerges(words, BpeMerges)
        .orderBy(col("step"))
    },

    // -- BPE corpus encoding (train + apply) -------------------------------
    // The stage AFTER training: tokenize the corpus with the learned
    // merges — per-doc BPE token counts, the number a token-budget
    // planner (sample_epoch_plan) actually wants. Standalone contract:
    // the query re-trains its 8 merges, then ENCODES — and encoding is
    // the trainer's applyMerge chained LAZILY 8 times over the
    // vocab-sized distinct-word state (no per-round data dependence ⇒
    // one plan, no driver actions — the designed contrast to training's
    // snapshot-per-round shape). The corpus pays one word-explode pass
    // and one broadcast-ish join back; everything between is
    // vocab-sized ([[graft.operators.BpeTrain.encodeWords]]).
    "text_bpe_encode" -> { (s, dir) =>
      // spread before the word explode (round-18, Tables.spread): the
      // tokenize pass otherwise serializes on the fixture's one-task scan
      val docw = Tables.spread(Tables(s, dir, "documents")
          .select(col("doc_id"), col("text")))
        .select(col("doc_id"), explode(filter(split(lower(col("text")), " "),
          (t: Column) => t =!= "")).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val words = docw.groupBy(col("w")).agg(count(lit(1)).as("c"))
        val merges = graft.operators.BpeTrain.trainMerges(words, BpeMerges)
          .orderBy(col("step"))
          .collect().map(row => (row.getString(1), row.getString(2))).toSeq
        val wt = graft.operators.BpeTrain.encodeWords(words.select(col("w")), merges)
        val perDoc = docw.join(wt, "w")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"), sum(col("n_bpe")).as("n_tokens_bpe"))
        Tables(s, dir, "documents").select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_words"), lit(0L)).as("n_words"),
            coalesce(col("n_tokens_bpe"), lit(0L)).as("n_tokens_bpe"))
          .orderBy(col("doc_id"))
          .localCheckpoint()
      } finally { docw.unpersist(false); () }
    },

    // -- semantic (embedding) decontamination -------------------------------
    // text_decontaminate's R-S embedding form (round-15 verdict #3) —
    // the pair modern pipelines run together: the shingle form catches
    // verbatim leakage, this form catches PARAPHRASED/near-duplicate
    // leakage a token-level overlap misses. Benchmark stand-in =
    // vec_id < 50 (the text_decontaminate doc_id < 10 rule); blocking =
    // one-sided LSH with the eval index BROADCAST and only the corpus
    // multi-probing ([[graft.operators.EmbedDedup.lshPairsAcross]]) —
    // at 100 TB the corpus streams past the tiny eval index with no
    // corpus shuffle, exactly like the shingle form. Exact-cosine
    // verification ⇒ zero false positives; recall floor measured vs the
    // all-pairs cross form in EmbedDedupSpec (LSH recall is
    // probabilistic, so this row is rows-only — the dedup_embed_lsh
    // precedent).
    "text_decontaminate_embed" -> { (s, dir) =>
      val emb = ScaleOps.normalized(s, dir).select(col("vec_id"), col("e"))
      val eval = emb.filter(col("vec_id") < 50)
      val corpus = emb.filter(col("vec_id") >= 50)
      val hits = graft.operators.EmbedDedup
        .lshPairsAcross(eval, corpus, threshold = 0.45,
          planesPerTable = graft.operators.EmbedDedup.autoPlanes(corpus.count()))
        .groupBy(col("corpus_id"))
        .agg(count(lit(1)).as("n_matches"), max(col("c")).as("max_c"))
      corpus.select(col("vec_id"))
        .join(hits, col("vec_id") === col("corpus_id"), "left")
        .select(col("vec_id"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          coalesce(col("max_c"), lit(0.0)).as("max_c"),
          col("n_matches").isNotNull.as("flagged"))
        .orderBy(col("vec_id"))
    }
  )

  /** The hybrid-retrieval fusion body shared by `search_hybrid_rrf`
    * (brute dense leg) and `search_hybrid_rrf_idx` (served ANN leg —
    * round-16 verdict #7): `dense` receives the normalized embedding
    * frame and must return the per-query dense top-20 as
    * (qid, doc_id, drank). Everything else — the BM25 leg, the
    * integer-rank RRF fuse, the output shape — is IDENTICAL by
    * construction, so the two rows differ only in the dense leg's
    * provenance.
    */
  private[queries] def searchHybrid(s: SparkSession, dir: String,
                                    dense: DataFrame => DataFrame): DataFrame = {
      graft.functions.CosineSimilarity.register(s)
      val toksCol = filter(split(lower(col("text")), " "),
        (t: Column) => t =!= "")
      val tok = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), toksCol.as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val dl = tok.filter(size(col("t")) > 0)
          .select(col("doc_id"), size(col("t")).as("dl"))
        val stats = dl.agg(count(lit(1)).as("n"),
          avg(col("dl").cast("double")).as("avgdl"))
        val qterms = tok.filter(col("doc_id") < 10)
          .select(col("doc_id").as("qid"), explode(col("t")).as("term"))
          .distinct()
        val tf = tok.select(col("doc_id"), explode(col("t")).as("term"))
          .join(broadcast(qterms.select(col("term")).distinct()), "term")
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
        val contrib = idf * col("tf") * Extra5.BmK1p1 /
          (col("tf") + lit(Extra5.BmK1) *
            (lit(Extra5.BmOneMinusB) + lit(Extra5.BmB) * col("dl") / col("avgdl")))
        val lex = tf.join(broadcast(qterms), Seq("term"))
          .filter(col("doc_id") =!= col("qid"))
          .join(broadcast(dfr), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .groupBy(col("qid"), col("doc_id"))
          .agg(round(sum(contrib), 4).as("bm25"))
        val wl = Window.partitionBy(col("qid"))
          .orderBy(col("bm25").desc, col("doc_id").asc)
        val lexTop = lex.withColumn("lrank", row_number().over(wl))
          .filter(col("lrank") <= 20)
          .select(col("qid"), col("doc_id"), col("lrank"))
        val n = ScaleOps.normalized(s, dir).select(col("vec_id"), col("e"))
        val denseTop = dense(n)
        val fused = lexTop.join(denseTop, Seq("qid", "doc_id"), "full_outer")
          .select(col("qid"), col("doc_id"), col("lrank"), col("drank"),
            round(
              coalesce(lit(1.0) / (lit(60) + col("lrank")), lit(0.0)) +
                coalesce(lit(1.0) / (lit(60) + col("drank")), lit(0.0)),
              6).as("rrf"))
        val wf = Window.partitionBy(col("qid"))
          .orderBy(col("rrf").desc, col("doc_id").asc)
        fused.withColumn("rn", row_number().over(wf))
          .filter(col("rn") <= 10)
          .select(col("qid"), col("rn"), col("doc_id"), col("rrf"),
            col("lrank"), col("drank"))
          .orderBy(col("qid"), col("rn"))
          .localCheckpoint()
      } finally { tok.unpersist(false); () }
  }

  /** The `_idx` rows are oracle-IDENTICAL to their siblings: same
    * operator, same dials, same deterministic iteration — only the
    * graph's provenance (session cache vs per-call build) differs, so
    * they share the siblings' SQL verbatim and the driver's hash check
    * pins the cache seam at full strength.
    */
  /** One unrolled PPR round (the graph_pagerank prIterSql discipline:
    * both engines run the IDENTICAL bounded iteration, so the driver
    * hash can only match when every round matches). The restart term is
    * a union branch of the same aggregate — the exact shape the Spark
    * rounds use.
    */
  private def pprIterSql(k: Int): String = s"""
      r$k AS (
        SELECT node, round(SUM(c), 10) AS pr FROM (
          SELECT a.n AS node,
                 CAST(${1.0 - PprAlpha} AS DOUBLE) * r.pr / d.d AS c
          FROM r${k - 1} r JOIN adj a ON r.node = a.v JOIN deg d ON r.node = d.v
          UNION ALL
          SELECT seed AS node,
                 CAST($PprAlpha AS DOUBLE) / (SELECT n FROM ns) AS c
          FROM seeds
        ) GROUP BY node
      )"""

  private val pprSql: String = s"""
      WITH so AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem),
      e AS (
        SELECT DISTINCT x.sk AS a, y.sk AS b
        FROM so x JOIN so y ON x.ok = y.ok AND x.sk < y.sk),
      adj AS (SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e),
      deg AS (SELECT v, COUNT(*) AS d FROM adj GROUP BY v),
      seeds AS (SELECT p_partkey AS seed FROM part WHERE p_size = 50),
      ns AS (SELECT COUNT(*) AS n FROM seeds),
      r0 AS (
        SELECT seed AS node, round(1.0 / (SELECT n FROM ns), 10) AS pr
        FROM seeds),
      ${(1 to PprIters).map(pprIterSql).mkString(",")}
      SELECT node, pr AS ppr FROM r$PprIters
      ORDER BY ppr DESC, node LIMIT 50"""

  /** One unrolled BPE round: the best pair of stage k−1 (count DESC,
    * pair ASC — the deterministic tie-break) and stage k's state after
    * the greedy left-to-right application (gaps-and-islands: rp is the
    * live sequence index, match islands are consecutive-rp runs, even
    * offsets apply, each applied position consumes its successor) —
    * term for term the shape [[graft.operators.BpeTrain.trainMerges]]
    * runs, so the hash can only match when every round matches.
    */
  private def bpeIterSql(k: Int): String = s"""
      best_$k AS MATERIALIZED (
        SELECT l, r, CAST(SUM(c) AS BIGINT) AS freq
        FROM (SELECT t AS l, lead(t) OVER (PARTITION BY w ORDER BY p) AS r, c
              FROM s${k - 1})
        WHERE r IS NOT NULL
        GROUP BY l, r
        ORDER BY freq DESC, l, r LIMIT 1),
      m_$k AS (
        SELECT w, c, p, t,
               coalesce(t = (SELECT l FROM best_$k)
                 AND lead(t) OVER (PARTITION BY w ORDER BY p)
                     = (SELECT r FROM best_$k), false) AS m,
               row_number() OVER (PARTITION BY w ORDER BY p) AS rp
        FROM s${k - 1}),
      i_$k AS (
        SELECT w, c, p, t, m, rp,
               CASE WHEN m THEN
                 rp - row_number() OVER (PARTITION BY w, m ORDER BY p)
               END AS isl
        FROM m_$k),
      a_$k AS (
        SELECT w, c, p, t, m, rp, isl,
               coalesce(m AND (rp - min(rp) OVER (PARTITION BY w, isl)) % 2 = 0,
                        false) AS ap
        FROM i_$k),
      s$k AS MATERIALIZED (
        SELECT w, c, p,
               CASE WHEN ap THEN t || (SELECT r FROM best_$k) ELSE t END AS t
        FROM (SELECT *, coalesce(lag(ap) OVER (PARTITION BY w ORDER BY p),
                                 false) AS consumed
              FROM a_$k)
        WHERE NOT consumed)"""

  /** The shared training-stage prefix: doc words, the distinct-word
    * frequency table, the character seed, and all [[BpeMerges]] unrolled
    * rounds — [[bpeSql]] reads the per-round bests off it and
    * [[bpeEncodeSql]] reads the FINAL state (both engines re-derive the
    * merges inside the query: the standalone contract).
    */
  private[queries] val bpeStagesSql: String = s"""
      WITH RECURSIVE docw AS MATERIALIZED (
        SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                          x -> x <> '')) AS w
        FROM documents),
      words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM docw GROUP BY w),
      s0 AS MATERIALIZED (
        SELECT w, c, i AS p, substr(w, i, 1) AS t
        FROM (SELECT w, c, unnest(generate_series(1, len(w))) AS i
              FROM words)),
      ${(1 to BpeMerges).map(bpeIterSql).mkString(",")}"""

  private val bpeSql: String = s"""
      $bpeStagesSql
      SELECT CAST(step AS INT) AS step, l, r, l || r AS merged, freq
      FROM (${(1 to BpeMerges).map(k =>
        s"SELECT $k AS step, l, r, freq FROM best_$k")
        .mkString("\n        UNION ALL ")})
      ORDER BY step"""

  private val bpeEncodeSql: String = s"""
      $bpeStagesSql,
      wt AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_bpe
        FROM s$BpeMerges GROUP BY w)
      SELECT d.doc_id,
             CAST(COALESCE(x.n_words, 0) AS BIGINT) AS n_words,
             CAST(COALESCE(x.n_tokens_bpe, 0) AS BIGINT) AS n_tokens_bpe
      FROM documents d LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n_words, SUM(n_bpe) AS n_tokens_bpe
        FROM docw JOIN wt USING (w) GROUP BY doc_id) x
      USING (doc_id)
      ORDER BY d.doc_id"""

  val oracle: Map[String, String] = Map(
    "text_bpe_train" -> bpeSql,
    "text_bpe_encode" -> bpeEncodeSql,

    "search_hybrid_rrf" -> s"""
      WITH tok AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
        FROM documents WHERE text IS NOT NULL),
      dl AS (SELECT doc_id, len(t) AS dl FROM tok WHERE len(t) > 0),
      stats AS (SELECT count(*) AS n, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
      qterms AS (
        SELECT DISTINCT doc_id AS qid, UNNEST(t) AS term
        FROM tok WHERE doc_id < 10),
      tf AS (
        SELECT doc_id, term, count(*) AS tf FROM (
          SELECT doc_id, UNNEST(t) AS term FROM tok)
        WHERE term IN (SELECT DISTINCT term FROM qterms)
        GROUP BY doc_id, term),
      dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      lex AS (
        SELECT qid, tf.doc_id,
               round(sum( ln((n - df + 0.5) / (df + 0.5) + 1.0)
                          * tf * ${Extra5.BmK1p1}
                          / (tf + ${Extra5.BmK1} * (${Extra5.BmOneMinusB}
                             + ${Extra5.BmB} * dl / avgdl)) ), 4) AS bm25
        FROM tf JOIN qterms USING (term) JOIN dfr USING (term)
             JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
        WHERE tf.doc_id <> qid
        GROUP BY qid, tf.doc_id),
      lex_top AS (
        SELECT qid, doc_id, lrank FROM (
          SELECT qid, doc_id, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS lrank
          FROM lex) WHERE lrank <= 20),
      nv AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) e,
               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS norm
        FROM embeddings),
      qv AS (SELECT vec_id AS qid, e AS qe, norm AS qn FROM nv WHERE vec_id < 10),
      cosd AS (
        SELECT qid, vec_id,
               ROUND(list_inner_product(qe, e) / (qn * norm), 5) AS c
        FROM qv JOIN nv ON vec_id <> qid),
      dense_top AS (
        SELECT qid, vec_id AS doc_id, drank FROM (
          SELECT qid, vec_id, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY c DESC, vec_id) AS drank
          FROM cosd) WHERE drank <= 20),
      fused AS (
        SELECT COALESCE(l.qid, d.qid) AS qid,
               COALESCE(l.doc_id, d.doc_id) AS doc_id,
               l.lrank, d.drank,
               ROUND(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lrank), 0)
                   + COALESCE(CAST(1.0 AS DOUBLE) / (60 + d.drank), 0), 6) AS rrf
        FROM lex_top l FULL OUTER JOIN dense_top d
          ON l.qid = d.qid AND l.doc_id = d.doc_id)
      SELECT qid, rn, doc_id, rrf, lrank, drank FROM (
        SELECT qid, doc_id, rrf, lrank, drank,
               ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY rrf DESC, doc_id) AS rn
        FROM fused)
      WHERE rn <= 10 ORDER BY qid, rn""",
    "graph_ppr" -> pprSql,
    "graph_ppr_idx" -> pprSql,
    // the incremental correction must equal the full rebuild — the
    // oracle IS merge_scd2's SQL over the union (all events)
    "merge_scd2_late" -> Extra8.oracle("merge_scd2"),

    "merge_scd2_asof" ->
      """WITH ev AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type
        |  FROM events),
        |runs AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN LAG(event_type) OVER w IS NULL
        |                OR LAG(event_type) OVER w <> event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |ver AS (
        |  SELECT user_id, ts, event_id, event_type, chg,
        |         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS version
        |  FROM runs),
        |dim AS (
        |  SELECT user_id AS du, version, event_type AS state,
        |         ts AS valid_from,
        |         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS valid_to
        |  FROM ver WHERE chg = 1),
        |probes AS (
        |  SELECT user_id, event_id, ts + INTERVAL 10 SECOND AS pts
        |  FROM ev WHERE event_id % 5 = 0)
        |SELECT p.user_id, p.event_id, p.pts, d.version, d.state
        |FROM probes p LEFT JOIN dim d ON p.user_id = d.du
        |  AND d.valid_from <= p.pts
        |  AND (d.valid_to IS NULL OR p.pts < d.valid_to)
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    "graph_triangles_idx" -> Extra7.oracle("graph_triangles"),
    "graph_kcore_idx" -> Extra7.oracle("graph_kcore"),
    "graph_bfs_idx" -> Extra7.oracle("graph_bfs"),
    "graph_sssp_idx" -> Extra7.oracle("graph_sssp"),
    "graph_labelprop_idx" -> Extra7.oracle("graph_labelprop"),
    "graph_linkpred_idx" -> Extra8.oracle("graph_linkpred")
  )
}
