package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Round-15 continuation operators. The reference
  * (/root/reference/task.ts) has no analogue; this is engine surface
  * for the brief's "operations a large-scale training-data pipeline
  * would need":
  *
  *   - the exact edit-distance family the near-dup surface was missing
  *     a non-probabilistic scale path for (`text_editdist_blocked`
  *     self-join, `text_editdist_cross` R-S match,
  *     `dedup_editdist_cluster` canonical clusters — all PassJoin
  *     blocking, [[graft.operators.EditDistJoin]]);
  *   - the importance-resampling document scorer every
  *     targeted-data-selection pipeline runs (`text_dsir`);
  *   - the repetition-aware token-budget planner a data-constrained
  *     run does before sampling (`sample_epoch_plan`);
  *   - the per-seed link-prediction serving shape (`graph_linkpred`);
  *   - the CDC-history → type-2 dimension build (`merge_scd2`).
  */
object Extra8 {
  type Q = (SparkSession, String) => DataFrame

  /** text_editdist_blocked's threshold: pairs at levenshtein ≤ 8 over
    * the 120-char prefixes — the same prefix contract as the
    * declared-baseline `text_editdist`, wide enough to catch the
    * fixture's one variable-length near pair (dist 4, lens 63/59) next
    * to the identical-prefix template mass (dist 0).
    */
  val EditDistK = 8

  /** text_dsir's hashed feature space: 16³ buckets from the first 3 hex
    * chars of each bigram's md5 (md5 strings are the repo's one
    * cross-engine hash — the text_fingerprint rule). The published
    * method uses 10⁴; a power-of-16 prefix keeps the bucketing a pure
    * string operation on both engines.
    */
  val DsirBuckets = 4096

  /** graph_linkpred's ranking body over a caller-supplied symmetrized
    * adjacency (v, n), its degree table (v, d), and a (seed) relation —
    * shared by the build-included query above and the `graph_linkpred_idx`
    * steady-state form (graft.queries.Extra9), which serves both frames
    * from [[graft.operators.Graphs]]. Returns (seed, rn, cand, common,
    * jac), unordered — callers sort.
    */
  private[queries] def linkpredTopK(adj: DataFrame, deg: DataFrame,
                                    seeds: DataFrame): DataFrame = {
    // sn is seed-neighbourhood-sized (|seeds| × avg degree) — broadcast
    // via Hints.nodeState into the wedge fan and the known-link anti
    // join (guide §3.1, the Bfs/KCore broadcastState rule): its
    // post-join size estimate otherwise makes the initial plan shuffle
    // the ADJACENCY (plans/r18: one adjacency-sized exchange in
    // graph_linkpred_idx before the fix, with AQE's broadcast
    // conversion landing after it). The conf escape (round-19, verdict
    // #2) is the billion-node form — |seeds|×avg-degree can exceed the
    // broadcast cap there.
    val sn = seeds.join(adj, col("seed") === col("v"))
      .select(col("seed"), col("n"))
    val wedge = graft.operators.Hints.nodeState(sn)
      .join(adj.select(col("v").as("n"), col("n").as("cand")), Seq("n"))
      .filter(col("cand") =!= col("seed"))
      .groupBy(col("seed"), col("cand"))
      .agg(count(lit(1)).as("common"))
      // NEW links only: drop candidates already adjacent to the seed
      .join(graft.operators.Hints.nodeState(
          sn.select(col("seed"), col("n").as("cand"))),
        Seq("seed", "cand"), "left_anti")
    val scored = wedge
      .join(deg.select(col("v").as("seed"), col("d").as("ds")), "seed")
      .join(deg.select(col("v").as("cand"), col("d").as("dc")), "cand")
      .select(col("seed"), col("cand"), col("common"),
        round(col("common").cast("double") /
          (col("ds") + col("dc") - col("common")), 6).as("jac"))
    val w = Window.partitionBy(col("seed"))
      .orderBy(col("jac").desc, col("cand").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("seed"), col("rn"), col("cand"), col("common"), col("jac"))
  }

  val queries: Map[String, Q] = Map(
    // -- exact edit-distance similarity join (segment blocking) ----------
    // The near-dup family's missing EXACT scale path: `text_editdist`
    // (the declared baseline) confines levenshtein to MinHash candidate
    // pairs and inherits LSH's probabilistic recall; this form finds
    // every pair at levenshtein ≤ k via PassJoin segment blocking
    // (pigeonhole over k+1 segments — recall exactly 1, verification
    // only on blocked candidates; [[graft.operators.EditDistJoin]]).
    // Oracle = the quadratic all-pairs levenshtein, so the hash can
    // only match when the blocking lost NOTHING. Scale shape: two
    // map-side expansions meeting in one equi hash join — linear where
    // the oracle form is quadratic.
    "text_editdist_blocked" -> { (s, dir) =>
      // spread: the segment/probe expansions are the dominant row-local
      // stages and the fixture scan plans one task (round-18,
      // Tables.spread)
      val p = Tables.spread(Tables(s, dir, "documents")
        .select(col("doc_id").as("id"), substring(col("text"), 1, 120).as("t")))
      graft.operators.EditDistJoin.pairs(p, k = EditDistK)
        .orderBy(col("d1"), col("d2"))
    },

    // -- edit-distance duplicate clusters --------------------------------
    // The step AFTER exact pair finding, completing the dedup-family
    // symmetry (neardup/minhash/embed all have a `_cluster` form):
    // blocked pairs → connected components → cluster id = min doc_id
    // with the canonical-doc flag — the dedup_cluster contract over the
    // PassJoin edge set, against the same RECURSIVE-CTE closure oracle
    // (the quadratic pair CTE feeds the reach closure, so the hash pins
    // both the blocking's exactness AND the clustering).
    "dedup_editdist_cluster" -> { (s, dir) =>
      // spread: the text_editdist_blocked rule (the pair stage is shared)
      val p = Tables.spread(Tables(s, dir, "documents")
        .select(col("doc_id").as("id"), substring(col("text"), 1, 120).as("t")))
      val edges = graft.operators.EditDistJoin.pairs(p, EditDistK)
        .select(col("d1").as("src"), col("d2").as("dst"))
      graft.operators.ConnectedComponents.clusterLabels(
          graft.operators.ConnectedComponents.components(edges))
        .orderBy(col("doc_id"))
    },

    // -- seed-restricted link prediction (common-neighbor Jaccard) -------
    // The serving shape of graph link prediction ("related products for
    // THESE items"): for each seed part (the graph family's shared
    // p_size=50 source set), rank NEW links — 2-hop candidates that are
    // not already neighbors — by neighborhood Jaccard
    // |N(a)∩N(b)| / |N(a)∪N(b)|, top 5 per seed. Seed-restriction is
    // the scale story: the wedge fan-out is seeds × deg², never the
    // whole graph's Σ deg² (the full-graph form is graph_triangles'
    // cost class); ranking uses the ROUNDED score + candidate id so
    // rank assignment is engine-independent (the sim_topk rule).
    "graph_linkpred" -> { (s, dir) =>
      val e = Extra7.coPurchaseEdges(s, dir)
      // adj feeds four consumers (seed neighbors, wedge fan, two degree
      // joins) → persist; the eager localCheckpoint at the end lets the
      // finally release both
      val adj = e.select(col("a").as("v"), col("b").as("n"))
        .unionAll(e.select(col("b").as("v"), col("a").as("n")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val deg = adj.groupBy(col("v")).agg(count(lit(1)).as("d"))
        val seeds = Tables(s, dir, "part")
          .filter(col("p_size") === 50)
          .select(col("p_partkey").as("seed"))
        linkpredTopK(adj, deg, seeds)
          .orderBy(col("seed"), col("rn"))
          .localCheckpoint()
      } finally { adj.unpersist(false); e.unpersist(false); () }
    },

    // -- cross-relation fuzzy match (R-S PassJoin) -----------------------
    // The decontamination-shaped use of the exact join: match one
    // corpus split (here sources src0-src4 — "the new crawl") against
    // the other (the canonical set) at levenshtein ≤ 8, one-sided
    // index ([[graft.operators.EditDistJoin.pairsAcross]]): only the
    // left side's segments index; the right side probes. Same oracle
    // discipline as text_editdist_blocked — the quadratic cross
    // product is the truth the blocking must reproduce exactly.
    "text_editdist_cross" -> { (s, dir) =>
      // spread: the text_editdist_blocked rule (probe generation is the
      // dominant row-local stage)
      val p = Tables.spread(Tables(s, dir, "documents")
        .select(col("doc_id").as("id"), col("source"),
          substring(col("text"), 1, 120).as("t")))
      val isLeft = col("source").isin("src0", "src1", "src2", "src3", "src4")
      graft.operators.EditDistJoin.pairsAcross(
          p.filter(isLeft).drop("source"),
          p.filter(!isLeft).drop("source"), k = EditDistK)
        .orderBy(col("d1"), col("d2"))
    },

    // -- repetition-aware token budget allocation ------------------------
    // The planning step a data-constrained run does BEFORE sampling
    // (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    // Models": repeated data holds value for ~4 epochs): given a token
    // budget B = 3× the corpus (so repetition is forced), per-source
    // mixture weights (the sample_mixture rule, 1 + src# mod 4) and a
    // 5-epoch repetition cap, allocate B across sources by weight,
    // clip at each source's cap, then redistribute the leftover over
    // the uncapped sources in one fixed second round. EVERY
    // intermediate is exact integer arithmetic (integer division for
    // shares — floors agree cross-engine), so the only float in the
    // output is the display-ratio epochs column. Scale shape: one
    // token-count pass over the corpus, then ~|sources|-row planning —
    // the compute is the scan, the value is the contract.
    "sample_epoch_plan" -> { (s, dir) =>
      val perSrc = Tables(s, dir, "documents")
        .select(col("source"),
          size(filter(split(lower(col("text")), " "),
            (t: Column) => t =!= "")).cast("long").as("ntok"))
        .groupBy(col("source"))
        .agg(sum(col("ntok")).as("tokens"), count(lit(1)).as("n_docs"))
        .withColumn("w", (lit(1) + coalesce(
          expr("try_cast(regexp_extract(source, '[0-9]+', 0) as int)"),
          lit(0)) % 4).cast("long"))
      val tot = perSrc.agg(sum(col("tokens")).as("tt"), sum(col("w")).as("ws"))
      val r1 = perSrc.crossJoin(broadcast(tot))
        .withColumn("budget", lit(3L) * col("tt"))
        .withColumn("cap_tokens", lit(5L) * col("tokens"))
        .withColumn("a1", expr("(budget * w) div ws"))
        .withColumn("c1", least(col("a1"), col("cap_tokens")))
      val lstats = r1.agg(
        (max(col("budget")) - sum(col("c1"))).as("leftover"),
        sum(when(col("c1") < col("cap_tokens"), col("w"))).as("uw"))
      r1.crossJoin(broadcast(lstats))
        .withColumn("a2",
          when(col("c1") < col("cap_tokens") && col("uw") > 0,
            col("c1") + expr("(leftover * w) div uw"))
            .otherwise(col("c1")))
        .withColumn("alloc", least(col("a2"), col("cap_tokens")))
        .select(col("source"), col("w"), col("n_docs"), col("tokens"),
          col("alloc"),
          round(col("alloc").cast("double") / col("tokens"), 6).as("epochs"),
          (col("alloc") === col("cap_tokens")).as("capped"))
        .orderBy(col("source"))
    },

    // -- CDC history → type-2 dimension build ----------------------------
    // The warehouse onboarding step merge_upsert doesn't cover: collapse
    // a change stream into a VERSIONED dimension (SCD type 2) — one row
    // per (entity, state run) with version number, [valid_from,
    // valid_to) range, and the is_current flag. Run boundaries are
    // change points under the total order (ts, event_id) — the tie
    // break makes version assignment engine-independent; valid_to =
    // the next version's valid_from (half-open ranges compose into a
    // gapless history — the property an as-of join against the
    // dimension depends on). Scale shape: two window passes over the
    // entity partition and nothing else — the same entity-keyed
    // exchange serves the change detection, the version cumsum, and
    // the range close.
    "merge_scd2" -> { (s, dir) =>
      // the build body is graft.operators.Merge.scd2Dim (extracted round
      // 16 — the late-data correction and the streaming sink must run
      // the same versioning code)
      graft.operators.Merge.scd2Dim(Tables(s, dir, "events"))
        .orderBy(col("user_id"), col("version"))
    },

    // -- hashed n-gram importance weights (DSIR) -------------------------
    // Data Selection via Importance Resampling (Xie et al. 2023) in
    // relational form: featurize every doc into hashed-bigram bucket
    // counts, estimate the target (here: the `lang = 'en'` sub-corpus —
    // "select data resembling the target domain") and raw bucket
    // distributions with Laplace smoothing, and score each doc with the
    // log importance weight Σ_b cnt_doc(b)·(ln p_tgt(b) − ln p_raw(b)).
    // Scale shape (the 100 TB lens): the gram relation aggregates to a
    // ≤ 4096-row bucket table (broadcast — never a collect), the
    // per-doc score is one partial-combined (doc, bucket) aggregate +
    // one broadcast join + one doc-keyed aggregate; nothing is
    // quadratic and nothing sorts. Tokenization is the filtered-split
    // convention (text_repetition); docs with < 2 tokens score 0 via
    // the left-join null extension.
    "text_dsir" -> { (s, dir) =>
      val toksCol = filter(split(lower(col("text")), " "),
        (x: Column) => x =!= "")
      val grams = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), toksCol.as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), col("lang"),
          explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
            concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1)))).as("g"))
        .select(col("doc_id"), col("lang"),
          substring(md5(col("g")), 1, 3).as("b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // one pass computes BOTH distributions (the raw count and the
      // target-conditional count share the bucket exchange)
      val buckets = grams.groupBy(col("b")).agg(
        count(lit(1)).as("raw_cnt"),
        count(when(col("lang") === "en", 1)).as("tgt_cnt"))
      val totals = buckets.agg(sum(col("raw_cnt")).as("raw_total"),
        sum(col("tgt_cnt")).as("tgt_total"))
      val b = DsirBuckets.toDouble
      val lr = buckets.crossJoin(broadcast(totals))
        .select(col("b"),
          (log((col("tgt_cnt") + 1) / (col("tgt_total") + b)) -
            log((col("raw_cnt") + 1) / (col("raw_total") + b))).as("lr"))
      val perDoc = grams.groupBy(col("doc_id"), col("b"))
        .agg(count(lit(1)).as("cnt"))
        .join(broadcast(lr), "b")
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_bigrams"),
          round(sum(col("cnt") * col("lr")), 6).as("dsir_logw"))
      try Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("dsir_logw"), lit(0.0)).as("dsir_logw"),
          (coalesce(col("dsir_logw"), lit(0.0)) > 0).as("selected"))
        .orderBy(col("doc_id"))
        .localCheckpoint()
      finally { grams.unpersist(false); () }
    }
  )

  val oracle: Map[String, String] = Map(
    "dedup_editdist_cluster" ->
      s"""WITH RECURSIVE p AS (
         |  SELECT doc_id, substr(text, 1, 120) AS t,
         |         length(substr(text, 1, 120)) AS len
         |  FROM documents),
         |pairs AS (
         |  SELECT a.doc_id d1, b.doc_id d2
         |  FROM p a JOIN p b ON a.doc_id < b.doc_id
         |  WHERE abs(a.len - b.len) <= $EditDistK
         |    AND levenshtein(a.t, b.t) <= $EditDistK),
         |edges AS (SELECT d1 v1, d2 v2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |verts AS (SELECT DISTINCT v1 AS v FROM edges),
         |reach(v, r) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT e.v1, reach.r FROM edges e JOIN reach ON e.v2 = reach.v)
         |SELECT v AS doc_id, MIN(r) AS cluster_id, (v = MIN(r)) AS is_canonical
         |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin,

    "graph_linkpred" ->
      """WITH so AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk FROM lineitem),
        |e AS (
        |  SELECT DISTINCT x.sk AS a, y.sk AS b
        |  FROM so x JOIN so y ON x.ok = y.ok AND x.sk < y.sk),
        |adj AS (SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT v, COUNT(*) AS d FROM adj GROUP BY v),
        |seeds AS (SELECT p_partkey AS seed FROM part WHERE p_size = 50),
        |sn AS (SELECT seed, n FROM seeds JOIN adj ON seed = v),
        |wedge AS (
        |  SELECT s.seed, a.n AS cand, COUNT(*) AS common
        |  FROM sn s JOIN adj a ON s.n = a.v AND a.n <> s.seed
        |  GROUP BY 1, 2),
        |fresh AS (
        |  SELECT w.* FROM wedge w
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM sn WHERE sn.seed = w.seed AND sn.n = w.cand)),
        |scored AS (
        |  SELECT f.seed, f.cand, f.common,
        |         ROUND(CAST(f.common AS DOUBLE) / (ds.d + dc.d - f.common), 6) AS jac
        |  FROM fresh f JOIN deg ds ON f.seed = ds.v JOIN deg dc ON f.cand = dc.v)
        |SELECT seed, rn, cand, common, jac FROM (
        |  SELECT seed, cand, common, jac,
        |         ROW_NUMBER() OVER (PARTITION BY seed
        |           ORDER BY jac DESC, cand ASC) AS rn
        |  FROM scored)
        |WHERE rn <= 5 ORDER BY seed, rn""".stripMargin,

    "text_editdist_blocked" ->
      s"""WITH p AS (
         |  SELECT doc_id, substr(text, 1, 120) AS t,
         |         length(substr(text, 1, 120)) AS len
         |  FROM documents)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |CAST(a.len AS INT) AS len1, CAST(b.len AS INT) AS len2,
         |levenshtein(a.t, b.t) AS dist
         |FROM p a JOIN p b ON a.doc_id < b.doc_id
         |WHERE abs(a.len - b.len) <= $EditDistK
         |  AND levenshtein(a.t, b.t) <= $EditDistK
         |ORDER BY d1, d2""".stripMargin,

    "text_editdist_cross" ->
      s"""WITH p AS (
         |  SELECT doc_id, source, substr(text, 1, 120) AS t,
         |         length(substr(text, 1, 120)) AS len
         |  FROM documents)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |CAST(a.len AS INT) AS len1, CAST(b.len AS INT) AS len2,
         |levenshtein(a.t, b.t) AS dist
         |FROM p a JOIN p b
         |  ON a.source IN ('src0','src1','src2','src3','src4')
         | AND b.source NOT IN ('src0','src1','src2','src3','src4')
         |WHERE abs(a.len - b.len) <= $EditDistK
         |  AND levenshtein(a.t, b.t) <= $EditDistK
         |ORDER BY d1, d2""".stripMargin,

    "merge_scd2" ->
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
        |  FROM runs)
        |SELECT user_id, version, event_type AS state,
        |       ts AS valid_from,
        |       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         AS valid_to,
        |       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         IS NULL AS is_current
        |FROM ver WHERE chg = 1
        |ORDER BY user_id, version""".stripMargin,

    "sample_epoch_plan" ->
      """WITH per_src AS (
        |  SELECT source,
        |         CAST(SUM(len(list_filter(string_split(lower(text), ' '),
        |                                  x -> x <> ''))) AS BIGINT) AS tokens,
        |         COUNT(*) AS n_docs
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, tokens, n_docs,
        |         CAST(1 + COALESCE(TRY_CAST(regexp_extract(source, '[0-9]+', 0) AS INT), 0) % 4
        |              AS BIGINT) AS w
        |  FROM per_src),
        |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt,
        |               CAST(SUM(w) AS BIGINT) AS ws FROM w),
        |r1 AS (
        |  SELECT source, tokens, n_docs, w,
        |         3 * tt AS budget, 5 * tokens AS cap_tokens,
        |         LEAST((3 * tt * w) // ws, 5 * tokens) AS c1
        |  FROM w, tot),
        |l AS (
        |  SELECT CAST(MAX(budget) - SUM(c1) AS BIGINT) AS leftover,
        |         CAST(SUM(CASE WHEN c1 < cap_tokens THEN w END) AS BIGINT) AS uw
        |  FROM r1),
        |fin AS (
        |  SELECT source, w, n_docs, tokens, cap_tokens,
        |         LEAST(CASE WHEN c1 < cap_tokens AND uw > 0
        |                    THEN c1 + (leftover * w) // uw ELSE c1 END,
        |               cap_tokens) AS alloc
        |  FROM r1, l)
        |SELECT source, w, n_docs, tokens, alloc,
        |ROUND(CAST(alloc AS DOUBLE) / tokens, 6) AS epochs,
        |alloc = cap_tokens AS capped
        |FROM fin ORDER BY source""".stripMargin,

    "text_dsir" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
         |  FROM documents),
         |idx AS (
         |  SELECT doc_id, lang, t, unnest(generate_series(1, len(t) - 1)) AS i
         |  FROM toks WHERE len(t) >= 2),
         |grams AS (
         |  SELECT doc_id, lang,
         |         substring(md5(t[i] || ' ' || t[i+1]), 1, 3) AS b
         |  FROM idx),
         |buckets AS (
         |  SELECT b, COUNT(*) AS raw_cnt,
         |         COUNT(CASE WHEN lang = 'en' THEN 1 END) AS tgt_cnt
         |  FROM grams GROUP BY b),
         |totals AS (
         |  SELECT CAST(SUM(raw_cnt) AS BIGINT) AS raw_total,
         |         CAST(SUM(tgt_cnt) AS BIGINT) AS tgt_total
         |  FROM buckets),
         |lr AS (
         |  SELECT b,
         |         ln((tgt_cnt + 1) / (tgt_total + $DsirBuckets.0)) -
         |         ln((raw_cnt + 1) / (raw_total + $DsirBuckets.0)) AS lr
         |  FROM buckets, totals),
         |per_doc AS (
         |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         |         ROUND(SUM(cnt * lr), 6) AS dsir_logw
         |  FROM (SELECT doc_id, b, COUNT(*) AS cnt FROM grams GROUP BY 1, 2) db
         |  JOIN lr USING (b)
         |  GROUP BY doc_id)
         |SELECT d.doc_id, d.lang,
         |CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |COALESCE(dsir_logw, 0.0) AS dsir_logw,
         |COALESCE(dsir_logw, 0.0) > 0 AS selected
         |FROM documents d LEFT JOIN per_doc USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
  )
}
