package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 extension operators — composing the round-11 export wave
  * into end-to-end pipeline steps. The reference
  * (/root/reference/task.ts) has no analogue; this is engine surface
  * for the brief's "operations a large-scale training-data pipeline
  * would need".
  *
  * Scale notes (the 100 TB lens, per query):
  *   - `sample_mix_plan`: the full mixing decision in one query —
  *     temperature-scaled source probabilities (the mT5 rule,
  *     [[Extra5]] `sample_temperature`) drive the greedy per-source
  *     token-budget fill ([[Extra4]] `sample_mixture`). Everything
  *     between the per-source rollup and the final join-back is
  *     source-cardinality-sized and broadcast; the fill runs per
  *     (source, md5-shard) so per-source cumsums never serialize a
  *     source through one task (16-way intra-source parallelism, the
  *     text_pack shard-key rule).
  *   - `quality_lr_score`: the SERVING half of `quality_lr` (training
  *     without serving is half the DCLM pattern): apply a stored
  *     weight row to unseen documents. Weights enter as a one-row
  *     broadcast relation — NOT plan literals — because that is the
  *     production shape (a model table joined in, refreshable without
  *     replanning); scoring itself is row-local (map-only above the
  *     scan), and the output is the per-doc decision stream a filter
  *     step consumes. Top/bottom reporting is TakeOrdered-bounded.
  */
object Extra6 {
  type Q = (SparkSession, String) => DataFrame

  /** Mixing dials: temperature alpha (shared with sample_temperature —
    * ONE constant, so the two queries can never drift apart) and the
    * corpus token-budget fraction filled by the plan.
    */
  val MixAlpha: Double = Extra5.TempAlpha
  val MixBudgetFrac = 0.5
  val MixShards = 16

  /** Stored `quality_lr` model weights (w0..w3 over the centered
    * features x1..x3 — see Extra5's feature definitions). Frozen from a
    * converged sf0.01 training run, snapped to the same 1e-6 grid the
    * trainer uses; spelled as literals so BOTH engines score with the
    * identical model (the BmK1p1 literal-folding rule).
    */
  val LrW: IndexedSeq[Double] = IndexedSeq(0.102871, 2.370442, -0.029346, -0.000031)

  /** PageRank dials: damping, rounds, and the per-round snap grid.
    * Ranks are O(1/N) ≈ 1e-4, so the 1e-10 grid keeps ~6 significant
    * digits — the same relative precision quality_lr's 1e-6 grid gives
    * its O(1) weights. Snapping after EVERY round is what makes the
    * iteration cross-engine deterministic: the per-node contribution
    * sum is order-sensitive double addition (~1e-18 drift), which the
    * grid absorbs before it can compound.
    */
  val PrDamping = 0.85
  val PrIters   = 5

  private def toks(c: Column): Column =
    filter(split(c, " "), (t: Column) => t =!= "")

  val queries: Map[String, Q] = Map(
    // -- temperature-weighted mixture plan ---------------------------------
    // sample_temperature produces probabilities; sample_mixture fills a
    // token budget from weights. A real pipeline runs exactly their
    // composition: p_temp_s = (n_s/N)^α / Z decides each source's slice
    // of the budget B = MixBudgetFrac · N, and each source contributes
    // docs in deterministic md5 order until its slice is full (greedy —
    // the doc crossing the boundary is kept). The fill is per
    // (source, shard): shard = first md5 hex char, each filling
    // slice/16, so the cumsum window never serializes a whole source.
    //
    // Determinism discipline: Z sums #sources doubles whose addition
    // order differs between engines, so p_temp is snapped to a 1e-6
    // grid BEFORE the target derives from it (the quality_lr
    // weight-snapping precedent) — the kept-decision is then a pure
    // function of the snapped probability on both sides. Output doubles
    // round to 4 for display; group key `source` is unique so ORDER BY
    // source is a total order.
    "sample_mix_plan" -> { (s, dir) =>
      // five consumers of the tokenized relation (per-source rollup,
      // grand, Z, window chain, final agg) → persist + try/finally
      // release after the eager checkpoint (multi-consumer discipline).
      val docTok = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          size(toks(lower(col("text")))).cast("long").as("ntok"))
        .withColumn("m", md5(col("doc_id").cast("string")))
        .withColumn("shard", substring(col("m"), 1, 1))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val per = docTok.groupBy(col("source"))
        .agg(sum(col("ntok")).cast("long").as("n_tokens"))
      val grand = per.agg(sum(col("n_tokens")).as("grand"))
      // one-row (Z, grand) normalizer pair, broadcast back (text_idf rule)
      val norm = per.crossJoin(broadcast(grand))
        .agg(sum(pow(col("n_tokens") / col("grand").cast("double"), MixAlpha))
               .as("z"),
             max(col("grand")).as("grand"))
      val pTemp = round(
        pow(col("n_tokens") / col("grand").cast("double"), MixAlpha) / col("z"),
        6)
      val targets = per.crossJoin(broadcast(norm))
        .select(col("source"), pTemp.as("p_temp"),
          (pTemp * col("grand") * MixBudgetFrac).as("target_tokens"))
      val cum = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val kept = col("cum_before") < col("target_tokens") / MixShards
      try docTok
        .withColumn("cum_before", coalesce(sum(col("ntok")).over(cum), lit(0L)))
        .join(broadcast(targets), "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("total_tokens"),
          round(max(col("p_temp")), 6).as("p_temp"),
          round(max(col("target_tokens")), 4).as("target_tokens"),
          count(when(kept, 1)).as("kept_docs"),
          sum(when(kept, col("ntok")).otherwise(lit(0L))).cast("long")
            .as("kept_tokens"))
        .orderBy(col("source"))
        .localCheckpoint()
      finally { docTok.unpersist(false); () }
    },

    // -- trained-classifier batch scoring ----------------------------------
    // Apply the stored LrW model to documents: recompute the x1..x3
    // features (identical definitions to the trainer — ONE drift and
    // train/serve skew appears, the classic serving bug), join the
    // one-row weight relation in broadcast, emit sigmoid score +
    // decision. Output: the 50 highest- and 50 lowest-scoring docs
    // (deterministic doc_id tie-break), the shape a human audits a
    // filter with. Row-local except the one-row broadcast and the
    // bounded TakeOrdered.
    "quality_lr_score" -> { (s, dir) =>
      val w = s.range(1).select(
        lit(LrW(0)).as("w0"), lit(LrW(1)).as("w1"),
        lit(LrW(2)).as("w2"), lit(LrW(3)).as("w3"))
      // two consumers of the scored relation (top and bottom band) →
      // persist + try/finally release after the eager checkpoint. The
      // scoring transform itself is graft.operators.QualityScorer — ONE
      // definition shared with the trainer and the streaming scorer.
      val scored = graft.operators.QualityScorer
        .score(Tables(s, dir, "documents"), w)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val top = scored.orderBy(col("p").desc, col("doc_id")).limit(50)
        .withColumn("band", lit("top"))
      val bot = scored.orderBy(col("p").asc, col("doc_id")).limit(50)
        .withColumn("band", lit("bottom"))
      try top.unionAll(bot)
        .select(col("band"), col("doc_id"), col("p"), col("keep"))
        .orderBy(col("band"), col("doc_id"))
        .localCheckpoint()
      finally { scored.unpersist(false); () }
    },

    // -- bounded-iteration PageRank ----------------------------------------
    // Iterative graph analytics in-engine (the quality_lr pattern with
    // relation-sized state instead of 4 doubles): PageRank over the
    // symmetric customer↔supplier co-order graph (edge = the pair
    // transacted at least once). Each round is one node-keyed join
    // (ranks ⋈ degrees — both node-cardinality) + one edge-keyed join +
    // one hash aggregate. The five rounds chain LAZILY into one
    // scheduled job (each round's state is consumed exactly once, so
    // nothing recomputes — see the loop comment; contrast Ivf's Lloyd,
    // which must materialize per round because its convergence test
    // reads each round's state twice). Traffic per round is O(edges)
    // bounded by the map-side combine, the wire per round is O(nodes),
    // and nothing corpus-sized ever reaches the driver (only the node
    // count does, once). The fixed-point/early-exit OPERATOR form —
    // which DOES checkpoint-and-free per round, because convergence
    // reads each round's state twice — is [[graft.operators.PageRank]].
    // The graph is symmetric so every node has degree ≥ 1 — no
    // dangling-mass term here (the operator form handles dangling
    // mass). Output: top-20 nodes.
    "graph_pagerank" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey"))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("ok"), col("o_custkey"))
      // LONG node ids (customer 2k, supplier 2k+1), labeled only in the
      // 20-row output: every distinct/join/aggregate hashes 8-byte longs
      // instead of strings (this + single-job rounds + the dst
      // pre-partition measured ×0.77 min-of-2 vs the string-keyed
      // checkpoint-per-round form: 12.5 → 9.6 s at sf0.1)
      val e0 = li.join(o, "ok")
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // Persist PRE-PARTITIONED BY dst so each round's partial
      // aggregate combines within already-dst-clustered partitions
      // (fewer distinct keys per task ⇒ tighter combine). NOTE the
      // honest limit, found by the PlanSpec gate: an AQE-wrapped cached
      // plan does NOT expose its partitioning to consumers, so
      // EnsureRequirements still inserts a per-round exchange — what
      // keeps that exchange cheap is the MAP-SIDE COMBINE below it
      // (node-sized wire, gate-pinned), not exchange elimination.
      val edges = e0
        .unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      try {
        val nNodes = deg.count() // the ONLY driver-side value
        val teleport = (1.0 - PrDamping) / nNodes
        // the rounds CHAIN LAZILY into one job: each round's state is
        // consumed exactly once (the next round's weight join), so
        // nothing recomputes, and Spark runs all five agg stages in one
        // scheduled job over the persisted edge relation instead of
        // paying five materialize-and-collect round trips. (Contrast
        // Ivf's Lloyd, which MUST materialize per round — its
        // convergence test reads each round's state twice.)
        var ranks: DataFrame = deg
          .select(col("src").as("node"), round(lit(1.0 / nNodes), 10).as("pr"))
        for (_ <- 1 to PrIters) {
          // contribution weight per SOURCE first (node-sized join), then
          // one edge join fans it out — never pr/outdeg per edge twice.
          // w is broadcast via Hints.nodeState (guide §3.1, the
          // Bfs/KCore broadcastState rule): its post-aggregation size
          // estimate otherwise makes the initial plan shuffle the cached
          // EDGE relation by src once per round — the exchange the dst
          // pre-partition comment below already conceded; the explicit
          // hint removes it instead of only keeping it cheap. The conf
          // escape (round-19, verdict #2) is the billion-node form: a
          // node-sized w no longer broadcasts at that scale.
          val w = ranks.join(deg, ranks("node") === deg("src"))
            .select(col("node"), (col("pr") / col("outdeg")).as("w"))
          ranks = edges.join(graft.operators.Hints.nodeState(w),
              edges("src") === w("node"))
            .groupBy(col("dst"))
            .agg(round(lit(teleport) + lit(PrDamping) * sum(col("w")), 10)
              .as("pr"))
            .select(col("dst").as("node"), col("pr"))
        }
        val label = when(col("node") % 2 === 0,
          concat(lit("c"), expr("node div 2")))
          .otherwise(concat(lit("s"), expr("(node - 1) div 2")))
        ranks
          .select(label.as("node"), col("pr"))
          .orderBy(col("pr").desc, col("node")).limit(20)
          .localCheckpoint()
      } finally { edges.unpersist(false); () }
    },

    // -- higher-moment group statistics --------------------------------------
    // Skewness/kurtosis per group WITHOUT trusting either engine's
    // built-in (Spark's skewness is population g1, DuckDB's is the
    // sample estimator — they disagree by design): both engines compute
    // the IDENTICAL central-moment formulas from raw power sums. The
    // sums themselves are bit-identical across engines and partitionings
    // because l_quantity is integral (1–50): Σx..Σx⁴ are integer-valued
    // doubles far below 2⁵³ at oracle scale, so double addition is
    // EXACT in any order. One hash aggregate, map-side partial.
    "agg_moments" -> { (s, dir) =>
      val m = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"),
          col("l_quantity").cast("double").as("x"))
        .groupBy(col("rf"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      val mean = col("s1") / col("n")
      val m2 = col("s2") / col("n") - mean * mean
      val m3 = col("s3") / col("n") - mean * (col("s2") / col("n")) * 3 +
        mean * mean * mean * 2
      val m4 = col("s4") / col("n") - mean * (col("s3") / col("n")) * 4 +
        mean * mean * (col("s2") / col("n")) * 6 -
        mean * mean * mean * mean * 3
      m.select(col("rf"), col("n"),
          round(mean, 6).as("mean"),
          round(m2, 6).as("m2"),
          round(m3 / pow(m2, 1.5), 6).as("skewness"),
          round(m4 / (m2 * m2) - 3.0, 6).as("kurtosis"))
        .orderBy(col("rf"))
    },

    // -- robust group statistics: exact MAD -----------------------------------
    // Median absolute deviation per group, EXACT, with engine-neutral
    // median semantics: built-in medians disagree (DuckDB interpolates,
    // Spark's percentile interpolates differently), so both engines
    // compute the nearest-rank lower median EXPLICITLY from the bounded
    // per-group value histogram (the corpus_prune machinery, grouped):
    // first value whose running count reaches ceil(n/2). Two passes
    // (median, then deviations' median), every windowed relation is
    // histogram-sized, medians broadcast back. l_quantity is integral →
    // deviations are integral → both medians are exact integers, no
    // rounding needed anywhere.
    "agg_mad" -> { (s, dir) =>
      val x = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"),
          col("l_quantity").cast("double").as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = x.groupBy(col("rf")).agg(count(lit(1)).as("n"))
      def nearestRankMedian(vals: DataFrame, v: String, out: String): DataFrame =
        vals.groupBy(col("rf"), col(v)).agg(count(lit(1)).as("c"))
          .withColumn("cum",
            sum(col("c")).over(Window.partitionBy(col("rf")).orderBy(col(v))))
          .join(broadcast(tot), "rf")
          .filter(col("cum") >= ceil(col("n") / lit(2.0)))
          .groupBy(col("rf")).agg(min(col(v)).as(out))
      val med = nearestRankMedian(x, "x", "median")
      val dev = x.join(broadcast(med), "rf")
        .select(col("rf"), abs(col("x") - col("median")).as("d"))
      val mad = nearestRankMedian(dev, "d", "mad")
      try tot.join(med, "rf").join(mad, "rf")
        .select(col("rf"), col("n"), col("median"), col("mad"))
        .orderBy(col("rf"))
        .localCheckpoint()
      finally { x.unpersist(false); () }
    },

    // -- regex extraction surface ---------------------------------------------
    // regexp_extract_all over the documents corpus: per doc the count of
    // long lowercase words (7+ letters) plus first/last match — the
    // remaining regex function family next to fn_string2's extract/replace.
    // Row-local; the only shuffle is the oracle total order.
    "fn_regex2" -> { (s, dir) =>
      val ms = regexp_extract_all(col("text"), lit("\\b[a-z]{7,}\\b"), lit(0))
      Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), ms.as("ms"))
        .select(col("doc_id"),
          size(col("ms")).cast("long").as("n_long_words"),
          element_at(col("ms"), 1).as("first_match"),
          element_at(col("ms"), -1).as("last_match"))
        .filter(col("n_long_words") > 0)
        .orderBy(col("doc_id"))
    },

    // -- the whole pipeline, end to end --------------------------------------
    // clean → exact content dedup → exact percentile prune → temperature
    // mix → shard manifest, composed as ONE query — the run a user
    // actually executes between a raw crawl and a training job, checked
    // against one oracle. Every stage is the registered operator's exact
    // logic (same constants, same snapping); the output is the 16-row
    // export manifest, so the oracle hash transitively pins every
    // upstream decision (a single doc kept/dropped differently anywhere
    // flips a shard checksum). Scale shape: stages hand off through
    // hash-partitioned relations (content hash → score histogram →
    // (source, shard) fill → shard manifest); the only single-partition
    // work is the bounded histogram window; targets/thresholds broadcast.
    "pipeline_end2end" -> { (s, dir) =>
      // stage 1+2: clean + exact dedup — canonical = min doc_id per
      // md5(text) (the dedup_doc_exact tie-break)
      val canon = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
        .withColumn("ch", md5(col("text")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("ch")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
      // stage 3: chars/token score + exact [P5, P95] band from the
      // distributed histogram (corpus_prune's logic, same constants)
      val scored = canon
        .select(col("doc_id"), col("source"), col("n_chars"), col("ch"),
          size(toks(col("text"))).as("ntok"))
        .filter(col("ntok") > 0)
        .select(col("doc_id"), col("source"), col("n_chars"), col("ch"),
          col("ntok"),
          round(col("n_chars").cast("double") / col("ntok"), 4).as("score"),
          md5(col("doc_id").cast("string")).as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
          col("ntok"), col("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // stage 4: temperature-weighted greedy (source, shard) budget fill
      // over the SURVIVORS (sample_mix_plan's logic, same grid snap)
      val per = kept1.groupBy(col("source"))
        .agg(sum(col("ntok")).cast("long").as("n_tokens"))
      val grand = per.agg(sum(col("n_tokens")).as("grand"))
      val norm = per.crossJoin(broadcast(grand))
        .agg(sum(pow(col("n_tokens") / col("grand").cast("double"), MixAlpha))
               .as("z"),
             max(col("grand")).as("grand"))
      val pT = round(
        pow(col("n_tokens") / col("grand").cast("double"), MixAlpha) / col("z"),
        6)
      val targets = per.crossJoin(broadcast(norm))
        .select(col("source"), (pT * col("grand") * MixBudgetFrac).as("target_tokens"))
      val cumW = Window
        .partitionBy(col("source"), substring(col("m"), 1, 1))
        .orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val sel = kept1
        .withColumn("cum_before", coalesce(sum(col("ntok")).over(cumW), lit(0L)))
        .join(broadcast(targets), "source")
        .filter(col("cum_before") < col("target_tokens") / MixShards)
      // stage 5: the 16-shard export manifest over the final keep-set
      // (export_shards' logic — fixed-width numeric hash range, so the
      // whole manifest is one true hash aggregate)
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
      finally { scored.unpersist(false); kept1.unpersist(false); () }
    }
  )

  /** One unrolled PageRank round as a DuckDB CTE: the previous round's
    * rank relation joins degrees (per-source weight), fans out over the
    * edge relation, re-aggregates per destination, and snaps to the
    * same 1e-10 grid the Spark side uses. Mirrors the engine loop
    * exactly — the quality_lr unrolled-iteration precedent.
    */
  private def prIterSql(k: Int): String = s"""
      r$k AS (
        SELECT e.dst AS node,
               round((1.0 - $PrDamping) / (SELECT n FROM nn)
                     + $PrDamping * SUM(r.pr / d.outdeg), 10) AS pr
        FROM edges e
        JOIN r${k - 1} r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      )"""

  val oracle: Map[String, String] = Map(
    "agg_moments" -> """
      WITH m AS (
        SELECT l_returnflag AS rf, CAST(count(*) AS BIGINT) AS n,
               sum(CAST(l_quantity AS DOUBLE)) AS s1,
               sum(CAST(l_quantity AS DOUBLE) * l_quantity) AS s2,
               sum(CAST(l_quantity AS DOUBLE) * l_quantity * l_quantity) AS s3,
               sum(CAST(l_quantity AS DOUBLE) * l_quantity * l_quantity * l_quantity) AS s4
        FROM lineitem GROUP BY l_returnflag
      )
      SELECT rf, n,
             round(s1 / n, 6) AS mean,
             round(s2 / n - (s1 / n) * (s1 / n), 6) AS m2,
             round((s3 / n - (s1 / n) * (s2 / n) * 3
                    + (s1 / n) * (s1 / n) * (s1 / n) * 2)
                   / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness,
             round((s4 / n - (s1 / n) * (s3 / n) * 4
                    + (s1 / n) * (s1 / n) * (s2 / n) * 6
                    - (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) * 3)
                   / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n)))
                   - 3.0, 6) AS kurtosis
      FROM m ORDER BY rf
    """,

    "agg_mad" -> """
      WITH x AS (
        SELECT l_returnflag AS rf, CAST(l_quantity AS DOUBLE) AS x FROM lineitem
      ), tot AS (
        SELECT rf, CAST(count(*) AS BIGINT) AS n FROM x GROUP BY rf
      ), h1 AS (
        SELECT rf, x, count(*) AS c FROM x GROUP BY rf, x
      ), med AS (
        SELECT rf, min(x) AS median FROM (
          SELECT h1.rf, x, sum(c) OVER (PARTITION BY h1.rf ORDER BY x) AS cum, n
          FROM h1 JOIN tot ON h1.rf = tot.rf
        ) WHERE cum >= ceil(n / 2.0) GROUP BY rf
      ), dev AS (
        SELECT x.rf, abs(x.x - med.median) AS d FROM x JOIN med ON x.rf = med.rf
      ), h2 AS (
        SELECT rf, d, count(*) AS c FROM dev GROUP BY rf, d
      ), mad AS (
        SELECT rf, min(d) AS mad FROM (
          SELECT h2.rf, d, sum(c) OVER (PARTITION BY h2.rf ORDER BY d) AS cum, n
          FROM h2 JOIN tot ON h2.rf = tot.rf
        ) WHERE cum >= ceil(n / 2.0) GROUP BY rf
      )
      SELECT tot.rf, n, median, mad
      FROM tot JOIN med ON tot.rf = med.rf JOIN mad ON tot.rf = mad.rf
      ORDER BY tot.rf
    """,

    "fn_regex2" -> """
      WITH x AS (
        SELECT doc_id, regexp_extract_all(text, '\b[a-z]{7,}\b') AS ms
        FROM documents WHERE text IS NOT NULL
      )
      SELECT doc_id, CAST(len(ms) AS BIGINT) AS n_long_words,
             ms[1] AS first_match, ms[-1] AS last_match
      FROM x WHERE len(ms) > 0 ORDER BY doc_id
    """,

    "pipeline_end2end" -> s"""
      WITH canon AS (
        SELECT doc_id, source, n_chars, text, ch FROM (
          SELECT doc_id, source, n_chars, text, md5(text) AS ch,
                 row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM documents WHERE text IS NOT NULL
        ) WHERE rn = 1
      ), scored AS (
        SELECT doc_id, source, n_chars, ch, ntok,
               round(CAST(n_chars AS DOUBLE) / ntok, 4) AS score,
               md5(CAST(doc_id AS VARCHAR)) AS m
        FROM (
          SELECT *, len(list_filter(string_split(text, ' '), t -> t <> '')) AS ntok
          FROM canon
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
        SELECT doc_id, source, n_chars, ch, ntok, m
        FROM scored, thr WHERE score >= lo AND score <= hi
      ), per AS (
        SELECT source, CAST(sum(ntok) AS BIGINT) AS n_tokens FROM kept1 GROUP BY source
      ), tot AS (
        SELECT sum(n_tokens) AS grand,
               sum(pow(n_tokens /
                 CAST((SELECT sum(n_tokens) FROM per) AS DOUBLE), $MixAlpha)) AS z
        FROM per
      ), tgt AS (
        SELECT source,
               round(pow(n_tokens / CAST(grand AS DOUBLE), $MixAlpha) / z, 6)
                 * grand * $MixBudgetFrac AS target_tokens
        FROM per CROSS JOIN tot
      ), fill AS (
        SELECT k.*,
               COALESCE(SUM(ntok) OVER (PARTITION BY source, substr(m, 1, 1)
                 ORDER BY m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM kept1 k
      ), sel AS (
        SELECT f.* FROM fill f JOIN tgt t ON f.source = t.source
        WHERE cum_before < target_tokens / $MixShards
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
    """,

    "graph_pagerank" -> s"""
      WITH e0 AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      ), edges AS (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst FROM e0
      ), deg AS (
        SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
      ), nn AS (
        SELECT COUNT(*) AS n FROM deg
      ), r0 AS (
        SELECT src AS node, round(1.0 / (SELECT n FROM nn), 10) AS pr FROM deg
      ), ${(1 to PrIters).map(prIterSql).mkString(",")}
      SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
                  ELSE 's' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
             pr
      FROM r$PrIters ORDER BY pr DESC, node LIMIT 20
    """,
    "sample_mix_plan" -> s"""
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
                 CAST((SELECT sum(n_tokens) FROM per) AS DOUBLE), $MixAlpha)) AS z
        FROM per
      ), tgt AS (
        SELECT source,
               round(pow(n_tokens / CAST(grand AS DOUBLE), $MixAlpha) / z, 6) AS p_temp,
               round(pow(n_tokens / CAST(grand AS DOUBLE), $MixAlpha) / z, 6)
                 * grand * $MixBudgetFrac AS target_tokens
        FROM per CROSS JOIN tot
      ), c AS (
        SELECT doc_id, source, ntok,
               COALESCE(SUM(ntok) OVER (PARTITION BY source, substr(m, 1, 1)
                 ORDER BY m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM dt
      )
      SELECT c.source, COUNT(*) AS n_docs,
             CAST(SUM(ntok) AS BIGINT) AS total_tokens,
             round(MAX(p_temp), 6) AS p_temp,
             round(MAX(target_tokens), 4) AS target_tokens,
             COUNT(CASE WHEN cum_before < target_tokens / $MixShards THEN 1 END) AS kept_docs,
             CAST(SUM(CASE WHEN cum_before < target_tokens / $MixShards
                           THEN ntok ELSE 0 END) AS BIGINT) AS kept_tokens
      FROM c JOIN tgt ON c.source = tgt.source
      GROUP BY c.source ORDER BY c.source
    """,

    "quality_lr_score" -> s"""
      WITH f AS (
        SELECT doc_id,
               len(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS ntok,
               CAST(list_sum(list_transform(
                 list_filter(string_split(lower(text), ' '), t -> t <> ''),
                 t -> length(t))) AS DOUBLE) AS wls,
               CAST(len(list_filter(string_split(lower(text), ' '),
                 t -> length(t) >= 5)) AS DOUBLE) AS nl
        FROM documents WHERE text IS NOT NULL
      ), x AS (
        SELECT doc_id,
               (ntok - 50) / 50.0 AS x1,
               wls / ntok - 4.5 AS x2,
               nl / ntok - 0.5 AS x3
        FROM f WHERE ntok > 0
      ), z AS (
        SELECT doc_id,
               ${LrW(0)} + ${LrW(1)} * x1 + ${LrW(2)} * x2 + ${LrW(3)} * x3 AS z
        FROM x
      ), scored AS (
        SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS p,
               CASE WHEN z >= 0 THEN 1 ELSE 0 END AS keep
        FROM z
      ), top AS (
        SELECT 'top' AS band, doc_id, p, keep FROM scored
        ORDER BY p DESC, doc_id LIMIT 50
      ), bot AS (
        SELECT 'bottom' AS band, doc_id, p, keep FROM scored
        ORDER BY p ASC, doc_id LIMIT 50
      )
      SELECT band, doc_id, p, CAST(keep AS BIGINT) AS keep
      FROM (SELECT * FROM top UNION ALL SELECT * FROM bot)
      ORDER BY band, doc_id
    """
  )
}
