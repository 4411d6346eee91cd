package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Oracle, Tables}

/** Round-10 extension operators — the second wave of training-pipeline
  * and time-series surface beyond SURVEY.md §2.3's original inventory
  * (which the reference at /root/reference has no analogue of; the
  * reference is a single-connector ETL — task.ts:1-224 — so everything
  * here is engine surface, not reference parity).
  *
  * All six are full-oracle queries (SURVEY §7.5 determinism discipline:
  * total ORDER BY, rounded float outputs, sizes cast to long so both
  * engines surface BIGINT).
  *
  * Scale notes (the 100 TB lens, per query):
  *   - `text_winnow`: ZERO shuffle — fingerprints are a pure per-row
  *     function (the [[graft.operators.MinHash.signaturesLocal]] rule).
  *   - `text_boilerplate`: one persisted gram relation feeding two hash
  *     aggregates + one hash join, all keyed on the gram — no sort, no
  *     self-join; the duplicated-gram table stays distributed (never
  *     collected or assumed broadcastable).
  *   - `text_gopher_quality`: row-local signal computation only.
  *   - `join_asof_tol`: the tolerance bound turns the as-of candidate
  *     join from "all earlier rows" into a bounded window — candidate
  *     cardinality is O(events in the tolerance), not O(history).
  *   - `ts_outlier`: per-key two-pass (aggregate + join back); the
  *     stats side is key-cardinality, AQE broadcasts it when small.
  *   - `sim_radius`: fixed query set broadcast against a single corpus
  *     scan — embarrassingly parallel, no window (unlike top-k).
  */
object Extra4 {
  type Q = (SparkSession, String) => DataFrame

  /** Winnowing parameters (Schleimer et al. 2003, "Winnowing: Local
    * Algorithms for Document Fingerprinting"): character k-grams hashed
    * per position, then the minimum hash of each sliding window of
    * `WinnowW` consecutive gram hashes is selected. Guarantee: any
    * shared substring of length ≥ k + w − 1 contributes at least one
    * IDENTICAL fingerprint to both documents, while only ~2/(w+1) of
    * positions are kept — the density/guarantee trade the paper proves
    * optimal. md5 strings are the cross-engine hash (the text_fingerprint
    * convention); lexicographic min over lowercase-hex ASCII agrees
    * byte-for-byte between Spark's UTF8String ordering and DuckDB's
    * VARCHAR ordering.
    */
  val WinnowK = 8
  val WinnowW = 4

  /** Gopher quality-rule lexicon (Rae et al. 2021 §A1.1): a document
    * must contain at least two DISTINCT words from this list. The
    * fixture vocabulary carries 'a' and 'the', so the rule genuinely
    * partitions the corpus.
    */
  val GopherStop: Seq[String] =
    Seq("the", "a", "and", "of", "to", "that", "have", "with", "be")
  private val gopherStopSql: String =
    GopherStop.map(w => s"'$w'").mkString("[", ", ", "]")

  private def toks: Column =
    filter(split(lower(col("text")), " "), (t: Column) => t =!= "")

  /** The sorted distinct winnowing fingerprint set of `text` as an
    * array<string> column — the declarative REFERENCE form. The
    * registered `text_winnow` runs the fused native expression
    * [[graft.functions.WinnowFingerprints]] instead (three interpreted
    * CodegenFallback lambdas + per-gram hex allocation vs one primitive
    * pass — the lshCandidatesWindowed keep-the-reference precedent);
    * Extra4Spec pins the two bit-identical, including multi-byte text.
    * Requires length(text) ≥ k + w − 1 (caller filters).
    *
    * The gram-hash array is BOUND through a 1-element `transform` lambda
    * before the window pass reads it: HOF lambdas are interpreted with NO
    * common-subexpression elimination, so referencing the `hs` expression
    * directly inside the window lambda would re-evaluate all O(len) md5s
    * once PER WINDOW — O(len²) per row (measured: a 14-minute stall at
    * sf0.1 vs seconds bound). A lambda variable is evaluated exactly once
    * by construction, restoring the linear cost the operator is sold on.
    */
  def winnowFingerprints(text: Column, k: Int = WinnowK,
                         w: Int = WinnowW): Column = {
    val hs = transform(sequence(lit(1), length(text) - (k - 1)),
      (i: Column) => md5(text.substr(i, lit(k))))
    element_at(
      transform(array(hs), (h: Column) =>
        array_sort(array_distinct(
          transform(sequence(lit(1), size(h) - (w - 1)),
            (j: Column) => array_min(slice(h, j, lit(w))))))),
      1)
  }

  /** Per-document Gopher quality signals + rule verdicts for a
    * (doc_id, text) frame — shared by `text_gopher_quality` and its
    * crafted-input spec.
    */
  def gopherQuality(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_words"),
        round(aggregate(col("t"), lit(0L),
          (acc: Column, t: Column) => acc + length(t)) / size(col("t")), 6)
          .as("mean_word_len"),
        round(size(filter(col("t"), (t: Column) => t.rlike("[a-z]")))
          / size(col("t")), 6).as("alpha_frac"),
        size(array_intersect(array_distinct(col("t")),
          array(GopherStop.map(lit): _*))).cast("long").as("n_stop_types"))
      .withColumn("ok_len", col("n_words").between(50, 100000))
      .withColumn("ok_word_len", col("mean_word_len").between(3, 10))
      .withColumn("ok_alpha", col("alpha_frac") >= 0.8)
      .withColumn("ok_stop", col("n_stop_types") >= 2)
      .withColumn("keep",
        col("ok_len") && col("ok_word_len") && col("ok_alpha") && col("ok_stop"))

  /** Per-document boilerplate signals (duplicated-5-gram instance
    * fraction) for a (doc_id, text) frame — shared by `text_boilerplate`
    * and its crafted-input spec. `minDf` is the cross-document
    * duplication threshold (a gram is boilerplate when it appears in ≥
    * minDf distinct docs).
    */
  def boilerplateSignals(docs: DataFrame, minDf: Long = 2L): DataFrame = {
    val base = docs
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 5)
    val inst = base
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 4),
          (i: Column) => concat_ws(" ",
            element_at(col("t"), i), element_at(col("t"), i + 1),
            element_at(col("t"), i + 2), element_at(col("t"), i + 3),
            element_at(col("t"), i + 4)))).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boiler = inst.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select(col("g"))
    val perDoc = inst.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val boilCnt = inst.join(boiler, "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_boiler"))
    try perDoc.join(boilCnt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        round(coalesce(col("n_boiler"), lit(0L)) / col("n_grams"), 6)
          .as("boiler_frac"))
      .withColumn("flagged", col("boiler_frac") >= 0.2)
      .localCheckpoint()
    finally { inst.unpersist(false); () }
  }

  /** Tolerance-bounded backward as-of join: for each left row, the single
    * right row of the same key with the greatest `rightTime` in
    * [leftTime − tolerance, leftTime] — INCLUSIVE lower bound, matching
    * pandas merge_asof's `abs(left − right) <= tolerance` — ties broken
    * by greatest `rightTieBreak`. Rows with no in-tolerance match are
    * dropped (inner). `leftId` must uniquely identify left rows (it
    * partitions the pick-one window). Shared by `join_asof_tol` and its
    * crafted-input spec.
    */
  def asofTolerance(left: DataFrame, right: DataFrame,
                    leftId: Column, leftKey: Column, rightKey: Column,
                    leftTime: Column, rightTime: Column,
                    rightTieBreak: Column, tolerance: String): DataFrame =
    left.join(right,
        leftKey === rightKey &&
          rightTime <= leftTime &&
          rightTime >= leftTime - expr(s"INTERVAL $tolerance"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(leftId)
          .orderBy(rightTime.desc, rightTieBreak.desc)))
      .filter(col("rn") === 1)
      .drop("rn")

  val queries: Map[String, Q] = Map(
    // -- winnowing fingerprints (document fingerprinting, round 10) --------
    // The robust-fingerprint sibling of text_fingerprint's 1-hash MinHash:
    // position-level k-gram hashes, window-min selection, distinct set.
    // Entirely row-local (one fused native expression per row, no explode,
    // no shuffle) — at 100 TB this is a map-only stage.
    // The ORDER-THEN-PROJECT shape is deliberate: a global orderBy runs
    // its input twice (RangePartitioner sketch pass + real pass), so an
    // expensive projection BELOW the sort pays 2×. Sorting the narrow
    // (doc_id, text) relation first and projecting above the Sort
    // evaluates the fingerprint expression exactly once per row (no
    // optimizer rule pushes a Project below a Sort; order is preserved).
    // Measured at 100×: 88.2 → 45.8 s.
    "text_winnow" -> { (s, dir) =>
      graft.functions.WinnowFingerprints.register(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull &&
          length(col("text")) >= WinnowK + WinnowW - 1)
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          graft.functions.WinnowFingerprints(col("text"), WinnowK, WinnowW)
            .as("f"))
        .select(col("doc_id"),
          size(col("f")).cast("long").as("n_fp"),
          array_min(col("f")).as("min_fp"),
          array_max(col("f")).as("max_fp"),
          Oracle.json(col("f")).as("fps"))
    },

    // -- corpus-duplicated n-gram fraction (boilerplate, round 10) ---------
    // RefinedWeb/MassiveText-style boilerplate signal: the fraction of a
    // document's token 5-gram INSTANCES whose gram also appears in at
    // least one OTHER document. Cross-doc df needs one global aggregate
    // on the gram key; the instance relation is persisted (three
    // consumers) and released after the eager checkpoint — the
    // nearDupPairs try/finally discipline.
    "text_boilerplate" -> { (s, dir) =>
      // spread: the 5-gram instance explode is the dominant row-local
      // stage and the fixture scan plans one task (round-18,
      // Tables.spread)
      boilerplateSignals(Tables.spread(
        Tables(s, dir, "documents").select(col("doc_id"), col("text"))))
        .orderBy(col("doc_id"))
    },

    // -- Gopher quality gate (round 10) ------------------------------------
    // The Gopher rule set (Rae et al. 2021 §A1.1) token-adapted to the
    // fixture: word-count band, mean-word-length band, alphabetic-word
    // fraction, ≥2 distinct required stopwords. Complements text_clean
    // (C4-style ttr/stopword-ratio gate) — different published ruleset,
    // same auditable per-reason output contract. Row-local signals only.
    "text_gopher_quality" -> { (s, dir) =>
      // order-then-project: sort the raw (doc_id, text) relation, then
      // compute the signals once above the Sort (filters/projections in
      // gopherQuality preserve the order).
      gopherQuality(Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).orderBy(col("doc_id")))
    },

    // -- tolerance-bounded as-of join (round 10) ---------------------------
    // For each error event, the LATEST same-user click within the
    // preceding 6 hours (pandas merge_asof's `tolerance` semantics —
    // matches older than the tolerance are no-matches, not fallbacks).
    // The lower bound is what makes this the scale-friendly as-of: the
    // candidate set per error is the tolerance window, not all history.
    "join_asof_tol" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cuid"),
          col("ts").as("click_ts"))
      asofTolerance(errs, clicks,
          leftId = col("event_id"),
          leftKey = col("user_id"), rightKey = col("cuid"),
          leftTime = col("ts"), rightTime = col("click_ts"),
          rightTieBreak = col("click_id"), tolerance = "6 HOURS")
        .select(col("event_id"), col("user_id"), col("click_id"), col("click_ts"))
        .orderBy(col("event_id"))
    },

    // -- per-key z-score outliers (round 10, telemetry QA) -----------------
    // Two-pass per-user anomaly flag: aggregate (n, mean, stddev) per
    // user, join back, emit events with |z| > 2 on the ROUNDED z (the
    // dedup_embed threshold convention — both engines filter the same
    // rounded value, so float fold-order drift can't flip a boundary
    // row). Users with < 5 events or zero variance are excluded (z is
    // undefined/degenerate there).
    "ts_outlier" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val stats = ev.groupBy(col("user_id")).agg(
          count(lit(1)).as("n"),
          avg(col("value")).as("mu"),
          stddev_samp(col("value")).as("sigma"))
        .filter(col("n") >= 5 && col("sigma") > 0)
      ev.join(stats, "user_id")
        .withColumn("z", round((col("value") - col("mu")) / col("sigma"), 6))
        .filter(abs(col("z")) > 2)
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("mu"), 4).as("mu"), round(col("sigma"), 4).as("sigma"),
          col("z"))
        .orderBy(col("event_id"))
    },

    // -- radius (threshold) similarity search (round 10) -------------------
    // The range-search sibling of sim_topk: ALL neighbors with cosine ≥
    // 0.30 for each query vector, no ranking window — one broadcast of
    // the query set, one corpus scan, codegen'd fused cosine.
    "sim_radius" -> { (s, dir) =>
      graft.functions.CosineSimilarity.register(s)
      val n = LlmOps.normalized(s, dir)
      val q = broadcast(n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe")))
      q.join(n, col("vec_id") =!= col("qid"))
        .withColumn("c",
          round(graft.functions.CosineSimilarity(col("qe"), col("e")), 5))
        .filter(col("c") >= 0.30)
        .select(col("qid"), col("vec_id"), col("c"))
        .orderBy(col("qid"), col("vec_id"))
    },

    // -- winnowing-based near-dup candidates (round 10) --------------------
    // Winnowing's actual production role (MOSS-style): the fingerprint
    // SET is the cheap per-doc sketch, and docs sharing ≥ 2 fingerprints
    // are verbatim-overlap candidates — the dedup_substring contract at
    // ~2/(w+1) of its gram volume. Longer grams than text_winnow
    // (k=20, w=8): on a small-vocabulary corpus 8-char grams collide on
    // common word fragments (measured: near-all-pairs), while 20-char
    // grams span ~4 words and discriminate. Same sort-free plan as
    // dedup_substring: row-local fingerprints → ONE capped hash-aggregate
    // on the fingerprint key → map-side pair explode (groups above the
    // cap would drop WHOLE; fixture max group is 5).
    "dedup_winnow" -> { (s, dir) =>
      // spread: the fingerprint explode is the dominant row-local stage
      // and the fixture scan plans one task (round-18, Tables.spread)
      graft.operators.SubstringDedup
        .candidates(Tables.spread(Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"))), mode = "winnow",
          gramLen = 20, minShared = 2L, window = 8)
        .orderBy(col("d1"), col("d2"))
    },

    // -- unigram cross-entropy quality signal (round 10) -------------------
    // The CCNet-style LM quality filter in relational form: per doc, the
    // mean token surprisal −log2(p_corpus(token)) under the corpus's own
    // unigram distribution — rote/templated docs score low, rare-token
    // soup scores high. The token relation is persisted (three
    // consumers: frequency aggregate, total count, per-doc join) and
    // released after the eager checkpoint; corpus totals ride a one-row
    // broadcast (the text_idf rule — never a collect).
    "text_unigram_xent" -> { (s, dir) =>
      val tok = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val freq = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      val total = tok.agg(count(lit(1)).as("n_total"))
      try tok.join(freq, "w")
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(-log(2.0, col("cnt") / col("n_total"))), 6).as("xent"))
        .orderBy(col("doc_id"))
        .localCheckpoint()
      finally { tok.unpersist(false); () }
    },

    // -- nearest as-of join (round 10) -------------------------------------
    // pandas merge_asof direction='nearest' with tolerance: the
    // same-user click with the SMALLEST |Δt| within ±6 h, ties broken
    // backward-first (click ≤ error preferred, pandas' rule) then by
    // greatest click id. |Δt| compares in exact integer microseconds —
    // no float boundary anywhere.
    "join_asof_nearest" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cuid"),
          col("ts").as("click_ts"))
      val diffUs = abs(unix_micros(col("click_ts")) - unix_micros(col("ts")))
      errs.join(clicks,
          col("user_id") === col("cuid") &&
            col("click_ts") >= col("ts") - expr("INTERVAL 6 HOURS") &&
            col("click_ts") <= col("ts") + expr("INTERVAL 6 HOURS"))
        .withColumn("diff_us", diffUs)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_id"))
            .orderBy(col("diff_us").asc,
              when(col("click_ts") <= col("ts"), 0).otherwise(1).asc,
              col("click_id").desc)))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("click_id"),
          col("click_ts"), col("diff_us"))
        .orderBy(col("event_id"))
    },

    // -- weighted source mixture (round 10) --------------------------------
    // The data-mixing step of a training pipeline: given per-source
    // weights and a corpus token budget (here: half the corpus), each
    // source contributes docs in deterministic md5 order until its
    // token target w_s/Σw × B is reached (greedy fill — the doc that
    // crosses the boundary is kept). Weights derive from the source id
    // (1 + n mod 4) so the mixture is reproducible from data alone.
    //
    // Scale shape: a per-source cumsum would be a SERIAL walk per source
    // (a parallelism ceiling of #sources at a 10-source corpus of any
    // size), so the greedy fill runs per (source, shard) — shard =
    // first md5 hex char, 16 shards, each filling target/16 — the
    // text_pack shard-key rule, portable to the oracle because the
    // shard derives from md5, not xxhash64. The only broadcast is the
    // one-row grand-total aggregate (the text_idf rule).
    "sample_mixture" -> { (s, dir) =>
      // four consumers of the tokenized relation (window chain, grand
      // total, weights, w-sum) → persist + try/finally release after the
      // eager checkpoint, the multi-consumer discipline.
      val docTok = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(filter(split(lower(col("text")), " "),
            (t: Column) => t =!= "")).cast("long").as("ntok"))
        .withColumn("m", md5(col("doc_id").cast("string")))
        .withColumn("shard", substring(col("m"), 1, 1))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val grand = docTok.agg(sum(col("ntok")).as("grand_tokens"))
      val weights = docTok.select(col("source")).distinct()
        // try_cast, not cast: under ANSI a digitless source would make
        // cast('' as int) THROW before coalesce sees it — the oracle's
        // TRY_CAST yields null→0 there, and the engines must agree.
        .withColumn("w",
          (lit(1) + coalesce(
            expr("try_cast(regexp_extract(source, '[0-9]+', 0) as int)"),
            lit(0)) % 4).cast("double"))
      val wSum = weights.agg(sum(col("w")).as("w_sum"))
      val targets = weights
        .crossJoin(broadcast(wSum)).crossJoin(broadcast(grand))
        .select(col("source"), col("w"),
          (col("w") / col("w_sum") * col("grand_tokens") * 0.5).as("target_tokens"))
      val cum = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, -1)
      try docTok
        .withColumn("cum_before", coalesce(sum(col("ntok")).over(cum), lit(0L)))
        .join(broadcast(targets), "source")
        .withColumn("kept", col("cum_before") < col("target_tokens") / 16)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("total_tokens"),
          max(col("w")).as("w"),
          round(max(col("target_tokens")), 4).as("target_tokens"),
          count(when(col("kept"), 1)).as("kept_docs"),
          sum(when(col("kept"), col("ntok")).otherwise(lit(0L)))
            .as("kept_tokens"))
        .orderBy(col("source"))
        .localCheckpoint()
      finally { docTok.unpersist(false); () }
    },

    // -- Bloom-filter membership screen (round 10) -------------------------
    // Ingest-time approximate dedup: incoming docs probed against a
    // Bloom filter of the seen corpus's content hashes — no false
    // negatives, fpp-bounded false positives routed to exact
    // verification. No oracle (the bit array is Spark's Murmur3 bloom,
    // not portable SQL); Extra4Spec gates the guarantee cells and
    // partitioning-invariance, the driver records rows-only.
    "dedup_bloom" -> { (s, dir) =>
      graft.operators.BloomDedup
        .screenReport(s, Tables(s, dir, "documents"), splitId = 250L)
        .orderBy(col("doc_id"))
    },

    // -- line-level corpus dedup (round 11) --------------------------------
    // The RefinedWeb/CCNet step text_boilerplate only MEASURES: remove
    // every line duplicated across the corpus (df ≥ 2 distinct docs) and
    // REWRITE the document from its surviving lines. The fixture has no
    // newlines, so "lines" are deterministic 10-token chunks (the
    // text_pii_mask synthetic-structure convention — both engines derive
    // the identical segmentation). Output: per-doc line counts and the
    // md5 of the reconstructed text (NULL when nothing survives, exactly
    // DuckDB's filtered string_agg).
    //
    // Scale shape (the text_boilerplate plan on lines): one persisted
    // line relation feeds a distinct + hash aggregate (corpus df) and a
    // line-keyed hash join back; reconstruction is a per-doc
    // sort_array(collect_list) bounded by document size. No sort, no
    // self-join; the duplicated-line table stays distributed.
    "text_line_dedup" -> { (s, dir) =>
      val lines = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          filter(split(col("text"), " "), (t: Column) => t =!= "").as("t"))
        .filter(size(col("t")) > 0)
        .select(col("doc_id"),
          transform(sequence(lit(1), ceil(size(col("t")) / lit(10.0)).cast("int")),
            (i: Column) => array_join(
              slice(col("t"), (i - lit(1)) * lit(10) + lit(1), lit(10)), " "))
            .as("ls"))
        .select(col("doc_id"), posexplode(col("ls")).as(Seq("pos", "line")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("idx"), col("line"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfRel = lines.select(col("doc_id"), col("line")).distinct()
        .groupBy(col("line")).agg(count(lit(1)).as("df"))
      try lines.join(dfRel, Seq("line"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_lines"),
          count(when(col("df") === 1, 1)).as("n_kept"),
          sort_array(collect_list(
            when(col("df") === 1, struct(col("idx"), col("line"))))).as("kl"))
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          when(col("n_kept") > 0,
            md5(array_join(transform(col("kl"),
              (x: Column) => x.getField("line")), "\n"))).as("kept_fp"))
        .orderBy(col("doc_id"))
        .localCheckpoint()
      finally { lines.unpersist(false); () }
    }
  )

  val oracle: Map[String, String] = Map(
    "text_line_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') t
        |  FROM documents
        |  WHERE text IS NOT NULL
        |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) > 0),
        |chunks AS (
        |  SELECT doc_id,
        |    list_transform(range(1, CAST(ceil(len(t)/10.0) AS BIGINT) + 1),
        |      i -> array_to_string(list_slice(t, (i-1)*10+1, (i-1)*10+10), ' ')) ls
        |  FROM base),
        |lines AS (
        |  SELECT doc_id, unnest(ls) AS line, unnest(range(1, len(ls)+1)) AS idx
        |  FROM chunks),
        |df AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY 1)
        |SELECT l.doc_id,
        |  count(*) AS n_lines,
        |  count(*) FILTER (WHERE df.df = 1) AS n_kept,
        |  md5(string_agg(l.line, chr(10) ORDER BY l.idx)
        |    FILTER (WHERE df.df = 1)) AS kept_fp
        |FROM lines l JOIN df ON l.line = df.line
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_winnow" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, length(text) - ${WinnowK - 1}),
         |      i -> md5(substr(text, i, $WinnowK))) hs
         |  FROM documents
         |  WHERE text IS NOT NULL AND length(text) >= ${WinnowK + WinnowW - 1}),
         |f AS (
         |  SELECT doc_id,
         |    list_sort(list_distinct(
         |      list_transform(generate_series(1, len(hs) - ${WinnowW - 1}),
         |        j -> list_min(list_slice(hs, j, j + ${WinnowW - 1}))))) f
         |  FROM h)
         |SELECT doc_id, len(f) AS n_fp, list_min(f) AS min_fp,
         |  list_max(f) AS max_fp, to_json(f) AS fps
         |FROM f ORDER BY doc_id""".stripMargin,

    "text_boilerplate" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') t
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] g
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) i
        |        FROM base WHERE len(t) >= 5)),
        |boiler AS (
        |  SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) df FROM inst GROUP BY g)
        |  WHERE df >= 2),
        |per_doc AS (SELECT doc_id, COUNT(*) n_grams FROM inst GROUP BY doc_id),
        |bc AS (SELECT doc_id, COUNT(*) n_boiler
        |       FROM inst JOIN boiler USING (g) GROUP BY doc_id)
        |SELECT p.doc_id, p.n_grams,
        |  COALESCE(bc.n_boiler, 0) AS n_boiler,
        |  ROUND(CAST(COALESCE(bc.n_boiler, 0) AS DOUBLE) / p.n_grams, 6) AS boiler_frac,
        |  ROUND(CAST(COALESCE(bc.n_boiler, 0) AS DOUBLE) / p.n_grams, 6) >= 0.2 AS flagged
        |FROM per_doc p LEFT JOIN bc ON p.doc_id = bc.doc_id
        |ORDER BY p.doc_id""".stripMargin,

    "text_gopher_quality" ->
      s"""SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop_types,
         |  ok_len, ok_word_len, ok_alpha, ok_stop,
         |  (ok_len AND ok_word_len AND ok_alpha AND ok_stop) AS keep
         |FROM (
         |  SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop_types,
         |    n_words BETWEEN 50 AND 100000 AS ok_len,
         |    mean_word_len BETWEEN 3 AND 10 AS ok_word_len,
         |    alpha_frac >= 0.8 AS ok_alpha,
         |    n_stop_types >= 2 AS ok_stop
         |  FROM (
         |    SELECT doc_id, len(t) AS n_words,
         |      ROUND(CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum')
         |            AS DOUBLE) / len(t), 6) AS mean_word_len,
         |      ROUND(CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
         |            AS DOUBLE) / len(t), 6) AS alpha_frac,
         |      len(list_intersect(list_distinct(t), $gopherStopSql)) AS n_stop_types
         |    FROM (SELECT doc_id,
         |            list_filter(string_split(lower(text), ' '), x -> x <> '') t
         |          FROM documents)
         |    WHERE len(t) > 0))
         |ORDER BY doc_id""".stripMargin,

    // every ts comparison casts ::TIMESTAMP (µs) — the FIXTURES §7.4
    // hazard: uncast TIMESTAMP_NS predicates would compare nanoseconds
    // DuckDB-side while Spark's Tables.events is µs-truncated.
    "join_asof_tol" ->
      """SELECT event_id, user_id, click_id, click_ts FROM (
        |  SELECT e.event_id, e.user_id, c.event_id AS click_id,
        |         c.ts::TIMESTAMP AS click_ts,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |           ORDER BY c.ts::TIMESTAMP DESC, c.event_id DESC) AS rn
        |  FROM events e JOIN events c
        |    ON e.user_id = c.user_id
        |   AND e.event_type = 'error' AND c.event_type = 'click'
        |   AND c.ts::TIMESTAMP <= e.ts::TIMESTAMP
        |   AND c.ts::TIMESTAMP >= e.ts::TIMESTAMP - INTERVAL '6 hours')
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "ts_outlier" ->
      """WITH stats AS (
        |  SELECT user_id, COUNT(*) n, AVG(value) mu, STDDEV_SAMP(value) sigma
        |  FROM events GROUP BY user_id
        |  HAVING COUNT(*) >= 5 AND STDDEV_SAMP(value) > 0)
        |SELECT event_id, e.user_id, value,
        |  ROUND(mu, 4) AS mu, ROUND(sigma, 4) AS sigma,
        |  ROUND((value - mu) / sigma, 6) AS z
        |FROM events e JOIN stats s ON e.user_id = s.user_id
        |WHERE abs(ROUND((value - mu) / sigma, 6)) > 2
        |ORDER BY event_id""".stripMargin,

    "sim_radius" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) e,
        |         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                                 CAST(embedding AS DOUBLE[]))) AS norm
        |  FROM embeddings),
        |q AS (SELECT vec_id qid, e qe, norm qnorm FROM n WHERE vec_id < 10)
        |SELECT qid, vec_id, c FROM (
        |  SELECT qid, vec_id,
        |         ROUND(list_inner_product(qe, e) / (qnorm * norm), 5) c
        |  FROM q JOIN n ON vec_id <> qid)
        |WHERE c >= 0.30 ORDER BY qid, vec_id""".stripMargin,

    "sample_mixture" ->
      """WITH dt AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS ntok
        |  FROM documents),
        |grand AS (SELECT SUM(ntok) grand_tokens FROM dt),
        |w AS (SELECT DISTINCT source,
        |        CAST(1 + COALESCE(TRY_CAST(regexp_extract(source, '[0-9]+') AS INT), 0) % 4
        |             AS DOUBLE) AS w
        |      FROM dt),
        |ws AS (SELECT SUM(w) w_sum FROM w),
        |tgt AS (SELECT source, w, w / w_sum * grand_tokens * 0.5 AS target_tokens
        |        FROM w, ws, grand),
        |c AS (SELECT doc_id, source, ntok,
        |        COALESCE(SUM(ntok) OVER (PARTITION BY source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |          ORDER BY md5(CAST(doc_id AS VARCHAR))
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |      FROM dt)
        |SELECT c.source, COUNT(*) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
        |  MAX(w) AS w, ROUND(MAX(target_tokens), 4) AS target_tokens,
        |  COUNT(CASE WHEN cum_before < target_tokens / 16 THEN 1 END) AS kept_docs,
        |  CAST(SUM(CASE WHEN cum_before < target_tokens / 16 THEN ntok ELSE 0 END)
        |       AS BIGINT) AS kept_tokens
        |FROM c JOIN tgt ON c.source = tgt.source
        |GROUP BY c.source ORDER BY c.source""".stripMargin,

    // the oracle runs the naive fingerprint self-join; Spark runs the
    // capped hash-aggregate — identical output while every fingerprint
    // group is under the cap (fixture max: 5 vs cap 500, the
    // dedup_substring budget).
    "dedup_winnow" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, length(text) - 19),
        |      i -> md5(substr(text, i, 20))) hs
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(text) >= 27),
        |f AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(
        |      list_transform(generate_series(1, len(hs) - 7),
        |        j -> list_min(list_slice(hs, j, j + 7))))) fp
        |  FROM h)
        |SELECT a.doc_id d1, b.doc_id d2, COUNT(*) AS shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY d1, d2""".stripMargin,

    "text_unigram_xent" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) w FROM documents),
        |t AS (SELECT doc_id, w FROM tok WHERE w <> ''),
        |freq AS (SELECT w, COUNT(*) cnt FROM t GROUP BY w),
        |total AS (SELECT COUNT(*) n_total FROM t)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  ROUND(AVG(-log2(CAST(cnt AS DOUBLE) / n_total)), 6) AS xent
        |FROM t JOIN freq USING (w), total
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "join_asof_nearest" ->
      """SELECT event_id, user_id, click_id, click_ts, diff_us FROM (
        |  SELECT e.event_id, e.user_id, c.event_id AS click_id,
        |         c.ts::TIMESTAMP AS click_ts,
        |         abs(epoch_us(c.ts::TIMESTAMP) - epoch_us(e.ts::TIMESTAMP)) AS diff_us,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |           ORDER BY abs(epoch_us(c.ts::TIMESTAMP) - epoch_us(e.ts::TIMESTAMP)),
        |                    CASE WHEN c.ts::TIMESTAMP <= e.ts::TIMESTAMP THEN 0 ELSE 1 END,
        |                    c.event_id DESC) AS rn
        |  FROM events e JOIN events c
        |    ON e.user_id = c.user_id
        |   AND e.event_type = 'error' AND c.event_type = 'click'
        |   AND c.ts::TIMESTAMP >= e.ts::TIMESTAMP - INTERVAL '6 hours'
        |   AND c.ts::TIMESTAMP <= e.ts::TIMESTAMP + INTERVAL '6 hours')
        |WHERE rn = 1 ORDER BY event_id""".stripMargin
  )
}
