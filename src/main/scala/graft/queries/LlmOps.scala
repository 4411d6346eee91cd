package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents` and `embeddings`
  * (SURVEY.md §2.3 `dedup_*`, `sim_topk`, `text_*`): exact + near
  * deduplication, similarity search, text analysis, fingerprinting.
  *
  * These fixture-scale implementations are exact and oracle-checked; the
  * probabilistic scale paths (MinHash-LSH banding, SimHash hamming
  * buckets, random-hyperplane ANN) live in [[graft.operators]] and are
  * held to fixture-equality/recall tests instead (SURVEY.md §7.5).
  */
object LlmOps {
  type Q = (SparkSession, String) => DataFrame

  /** Shared stopword list — identical literal list in the SQL texts. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  private val stopSqlList: String =
    Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** (doc_id, lowercase 3-gram word shingle) rows, NOT deduplicated —
    * the ONE tokenisation both the exact path ([[shingles]]) and the
    * MinHash path (ScaleOps `dedup_minhash`, which distincts on 64-bit
    * hashes instead of strings) derive from, so the two can never drift.
    *
    * Typed `flatMap` rather than `explode(transform(sequence(...)))`:
    * the HOF formulation interprets three `element_at` + `concat_ws`
    * expression trees per shingle (CodegenFallback), where this compiles
    * to a plain Scala loop. Output rows are identical.
    */
  private[queries] def shingleRowsRaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread BEFORE the tokenize/flatMap (round-18, Tables.spread): the
    // single-row-group fixture scan plans one task, so the shingle
    // stage — every consumer's dominant row-local compute — would
    // otherwise serialize on one core; on a many-file layout spread is
    // a no-op
    Tables.spread(Tables(s, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, t) =>
        if (t.length < 3) Iterator.empty
        else (0 to t.length - 3).iterator.map { i =>
          (id, s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
        }
      }
      .toDF("doc_id", "s")
  }

  /** doc_id + distinct lowercase 3-gram word shingles ("a b c"). */
  private[graft] def shingles(s: SparkSession, dir: String): DataFrame =
    shingleRowsRaw(s, dir).distinct()

  /** Lazy asymmetric-containment pipeline over a given shingle relation
    * (|A∩B|/|A| ≥ 0.8, both directions). Kept SEPARATE from the
    * registered `dedup_containment` entry so PlanSpec can audit the plan
    * it describes — the registered query localCheckpoints this frame
    * eagerly, after which the executed plan is just a scan of the
    * checkpointed RDD. Both directions come from ONE explode, not a
    * union of two projections: a union re-executes the whole shingle
    * self-join per branch (only the scan exchange gets reused — verified
    * with PlanDump), doubling the dominant cost; explode emits both rows
    * in the same map pass.
    */
  private[graft] def containmentFrom(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.alias("a")
      .join(sh.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("i"))
    val dirs = inter.select(explode(array(
        struct(col("d1").as("src"), col("d2").as("dst"), col("i")),
        struct(col("d2").as("src"), col("d1").as("dst"), col("i")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.i").as("i"))
    dirs.join(sizes.select(col("doc_id").as("src"), col("n")), "src")
      // filter on the UNROUNDED ratio (matches the SQL text) — a
      // rounded 0.7999996→0.8 would otherwise pass here but not there
      .filter(col("i") / col("n") >= 0.8)
      .withColumn("containment", round(col("i") / col("n"), 6))
      .select(col("src").as("contained"), col("dst").as("container"),
        col("containment"))
  }

  /** Exact shingle-Jaccard near-dup pairs (d1 < d2, jac ≥ 0.6) — the ONE
    * pair definition shared by `dedup_neardup` and `dedup_cluster`.
    *
    * The shingle relation — tokenize + explode + distinct, the pipeline's
    * largest intermediate — feeds the sizes aggregate AND the self-join
    * (whose two sides share an exchange, but sizes shuffles on a
    * different key and re-derives the relation from scratch). Persist it
    * once; the pairs output is localCheckpoint'd EAGERLY so the cache is
    * released before returning (the MinHash.nearDuplicatesFromText
    * discipline: pairs-above-threshold are orders of magnitude smaller
    * than the shingle relation at any scale).
    */
  private def nearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.alias("a")
      .join(sh.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("i"))
    // try/finally (the MinHash.nearDuplicatesFromText discipline): if the
    // eager checkpoint throws, the pipeline's largest intermediate must not
    // stay cached until the ContextCleaner gets to it (the round-1 leak).
    try inter
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jac", round(col("i") / (col("n1") + col("n2") - col("i")), 6))
      .filter(col("jac") >= 0.6)
      .select(col("d1"), col("d2"), col("jac"))
      .localCheckpoint()
    finally { sh.unpersist(false); () }
  }

  /** Per-document token counts — the ONE definition of the corpus
    * quality signals, shared by `text_quality` and `text_clean` so the
    * two can never drift.
    */
  // Fused per-row form (round 10): every output is a pure function of
  // the row's token array, so the corpus-wide (doc_id, token) aggregate
  // the explode+groupBy form paid is gone — one TokenStats expression
  // pass, zero shuffle. Same tokenization (split on " ", empties kept)
  // as the aggregate form it replaces.
  private def tokenStats(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TokenStats.register(s, Stopwords)
    Tables(s, dir, "documents")
      // null text produced NO rows under the explode form — keep that
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TokenStats(split(lower(col("text")), " ")).as("ts"))
      .select(col("doc_id"),
        col("ts.n_tokens").as("n_tokens"),
        col("ts.n_distinct").as("n_distinct"),
        col("ts.n_stop").as("n_stop"))
  }

  /** Embedding as double array + its L2 norm (computed once per vector —
    * pairwise joins then only need the dot product).
    */
  private[queries] def normalized(s: SparkSession, dir: String): DataFrame = {
    val e = transform(col("embedding"), (x: Column) => x.cast("double"))
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), e.as("e"))
      .withColumn("norm", sqrt(aggregate(
        transform(col("e"), (x: Column) => x * x),
        lit(0.0), (acc: Column, x: Column) => acc + x)))
  }

  val queries: Map[String, Q] = Map(
    // -- exact dedup --------------------------------------------------------
    "dedup_exact" -> { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
        .orderBy(col("user_id"), col("event_type"))
    },

    // -- shingle-Jaccard near-dup (exact; MinHash-LSH is the scale path) ---
    // Shingle-explode + equi-self-join on the shingle: candidate pairs are
    // only those sharing ≥1 shingle — already far from O(n²) on real text.
    "dedup_neardup" -> { (s, dir) =>
      nearDupPairs(s, dir).orderBy(col("d1"), col("d2"))
    },

    // -- exact content-hash dedup -----------------------------------------
    // The first pass of every dedup pipeline: group by a content digest
    // so the shuffle moves 16-byte keys instead of document bodies, keep
    // the smallest doc_id as canonical. md5 (not xxhash64) so the digest
    // is engine-portable — the dedup decision is reproducible outside
    // Spark, which matters when the keep-list is shared across systems.
    "dedup_doc_exact" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc"))
        .orderBy(col("content_hash"))
    },

    // -- asymmetric containment near-dup ----------------------------------
    // Jaccard misses subset duplication (a short doc quoted inside a
    // long one barely moves |A∪B|); containment |A∩B|/|A| is the
    // direction-aware signal: ≥0.8 of the SOURCE doc's shingles appear
    // in the target. The symmetric intersection is computed once
    // (same shape as nearDupPairs) and both directions are emitted from
    // it — no second shingle join.
    "dedup_containment" -> { (s, dir) =>
      // sh persisted for the same two-consumer reason as nearDupPairs
      // (sizes + self-join); released by the eager checkpoint below.
      val sh = shingles(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out =
        try containmentFrom(sh).localCheckpoint()
        finally { sh.unpersist(false); () }
      out.orderBy(col("contained"), col("container"))
    },

    // -- benchmark decontamination ----------------------------------------
    // The training-data hygiene op: flag corpus documents sharing too
    // many shingles with a benchmark/eval set (stand-in here: docs with
    // doc_id < 10). The benchmark shingle set is SMALL by nature, so it
    // broadcasts — at 100 TB the corpus streams past it with no shuffle
    // of corpus shingles. Contamination ratio divides exact ints.
    "text_decontaminate" -> { (s, dir) =>
      val sh = shingles(s, dir)
      val bench = broadcast(sh.filter(col("doc_id") < 10)
        .select(col("s")).distinct()
        .withColumn("hit", lit(1)))
      // ONE corpus pass: a left join against the broadcast benchmark set
      // marks each shingle, and a single aggregation produces both the
      // total and the overlap (count(hit) skips the unmatched nulls).
      // The previous two-aggregation form (sizes + inner-join overlap,
      // joined back) executed the corpus shingle pipeline twice.
      sh.filter(col("doc_id") >= 10)
        .join(bench, Seq("s"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_overlap"))
        .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
          (col("n_overlap").cast("double") / col("n_shingles")).as("contamination"),
          (col("n_overlap").cast("double") / col("n_shingles") >= 0.5).as("flagged"))
        .orderBy(col("doc_id"))
    },

    // -- edit-distance verification of candidate pairs --------------------
    // The verification step a pipeline runs when shingle Jaccard alone is
    // not trusted: levenshtein over a fixed prefix, on CANDIDATE pairs
    // only — the quadratic-cost function never sees more than the pair
    // list. `sim` divides two exact ints, so both engines produce the
    // identical double with no rounding.
    "text_editdist" -> { (s, dir) =>
      val prefix = Tables(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 120).as("t"))
      val dist = levenshtein(col("t1"), col("t2"))
      nearDupPairs(s, dir)
        .join(prefix.select(col("doc_id").as("d1"), col("t").as("t1")), "d1")
        .join(prefix.select(col("doc_id").as("d2"), col("t").as("t2")), "d2")
        .select(col("d1"), col("d2"), col("jac"), dist.as("dist"),
          (lit(1.0) - dist.cast("double") /
            greatest(length(col("t1")), length(col("t2")))).as("sim"))
        .orderBy(col("d1"), col("d2"))
    },

    // -- duplicate clusters + canonical doc (the step AFTER pair finding) --
    // Near-dup pairs → connected components → cluster id = min doc_id;
    // a real pipeline keeps is_canonical and drops the rest.
    "dedup_cluster" -> { (s, dir) =>
      val edges = nearDupPairs(s, dir)
        .select(col("d1").as("src"), col("d2").as("dst"))
      graft.operators.ConnectedComponents.clusterLabels(
          graft.operators.ConnectedComponents.components(edges))
        .orderBy(col("doc_id"))
    },

    // -- brute-force cosine top-k (ANN baseline) ---------------------------
    // Query side is tiny (vec_id < 10) → broadcast; ranking uses the
    // ROUNDED cosine + vec_id so rank assignment is engine-independent.
    // Cosine runs through the codegen'd native expression (fused
    // dot+norms loop) instead of interpreted HOF lambdas.
    "sim_topk" -> { (s, dir) =>
      graft.functions.CosineSimilarity.register(s)
      val n = normalized(s, dir)
      val q = broadcast(n.select(col("vec_id").as("qid"), col("e").as("qe")))
      val cos = q.join(n, col("vec_id") =!= col("qid") && col("qid") < 10)
        .withColumn("c", round(graft.functions.CosineSimilarity(col("qe"), col("e")), 5))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("vec_id").asc)
      cos.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("rn"), col("vec_id"), col("c"))
        .orderBy(col("qid"), col("rn"))
    },

    // -- embedding-cosine near-dup -----------------------------------------
    // All-pairs is inherently O(n²); the declarative BNL-join version
    // spends its time in per-pair interpreted lambda evaluation (48 s at
    // sf0.1). This is the one genuine per-partition-imperative case
    // (SURVEY.md §1.3): broadcast the (small) vector table once and do
    // primitive-double dot products partition-locally — same left-to-right
    // summation order as the SQL fold, so results are bit-identical.
    // At 100 TB the brute-force op is only for bounded slices; `sim_ann`
    // (LSH) is the unbounded-scale path.
    "dedup_embed" -> { (s, dir) =>
      import s.implicits._
      val n = normalized(s, dir)
      val vecs = n.select(col("vec_id"), col("label"), col("e"), col("norm"))
        .as[(Long, Int, Array[Double], Double)]
      // Driver-memory guard: this baseline broadcasts the WHOLE vector
      // table, so it is only valid for bounded slices. Fail fast with
      // the escalation path named instead of OOMing the driver —
      // limit+count so the guard itself never scans an unbounded corpus.
      require(vecs.limit(1000001).count() <= 1000000,
        "dedup_embed is the bounded all-pairs baseline (> 1e6 vectors); " +
          "use sim_ann (hyperplane LSH) or sim_ivf for unbounded corpora")
      val all = vecs.collect().sortBy(_._1)
      val bc = s.sparkContext.broadcast(all)
      val pairs = vecs.mapPartitions { it =>
        val others = bc.value
        // Cauchy–Schwarz tail norms at the PfxLen prefix boundary, one
        // pass per partition: Σ_{j≥PfxLen} e_j² per vector. For any
        // pair, Σ_{j≥PfxLen} e1_j·e2_j ≤ √(rem1·rem2), so a pair whose
        // prefix dot plus that bound cannot reach the threshold is
        // pruned after PfxLen of the dim multiplies — and a SURVIVOR
        // continues the SAME sequential sum from i = PfxLen, so the
        // final acc (and the rounded output) is bit-identical to the
        // unpruned fold.
        val PfxLen = 16
        val rem = Array.tabulate(others.length) { j =>
          val e = others(j)._3
          var s = 0.0
          var i = math.min(PfxLen, e.length)
          while (i < e.length) { s += e(i) * e(i); i += 1 }
          s
        }
        it.flatMap { case (v1, label1, e1, norm1) =>
          // binary search to the first id > v1 (others sorted by vec_id)
          var lo = 0
          var hi = others.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (others(mid)._1 <= v1) lo = mid + 1 else hi = mid
          }
          var rem1 = 0.0
          var ri = math.min(PfxLen, e1.length)
          while (ri < e1.length) { rem1 += e1(ri) * e1(ri); ri += 1 }
          val pfx = math.min(PfxLen, e1.length)
          // prune/emit margins: 0.4499994 is strictly below every
          // double that can HALF_UP-round to ≥ 0.45 at 6 dp, with
          // ~5e-8 absolute slack — float error in a 64-term dot
          // (~1e-14) cannot cross it, so the exact BigDecimal check
          // still decides every boundary case. The per-pair BigDecimal
          // was the kernel's original cost (~100 ns × N²/2 pairs); now
          // only near-threshold survivors pay it.
          (lo until others.length).iterator.flatMap { j =>
            val (v2, label2, e2, norm2) = others(j)
            var acc = 0.0
            var i = 0
            while (i < pfx) { acc += e1(i) * e2(i); i += 1 }
            if (acc + math.sqrt(rem1 * rem(j)) < 0.44999940 * (norm1 * norm2)) None
            else {
              while (i < e1.length) { acc += e1(i) * e2(i); i += 1 }
              val raw = acc / (norm1 * norm2)
              if (raw < 0.44999949) None
              else {
                val c = BigDecimal(raw)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (c >= 0.45) Some((v1, v2, c, label1, label2)) else None
              }
            }
          }
        }
      }
      pairs.toDF("v1", "v2", "c", "label1", "label2")
        .orderBy(col("v1"), col("v2"))
    },

    // -- token counting / top-k tokens -------------------------------------
    "text_tokens" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("token"))
        .filter(col("token") =!= "" && !col("token").isInCollection(Stopwords))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    },

    // -- per-language corpus stats ------------------------------------------
    "text_stats" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          min(length(col("text"))).as("min_len"),
          max(length(col("text"))).as("max_len"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    },

    // -- per-document quality signals ----------------------------------------
    // Token-level ratios (type-token ratio, stopword ratio) — standard
    // corpus-quality features; explode + map-side-combined aggregation.
    "text_quality" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("n_chars_real"))
        .join(tokenStats(s, dir), "doc_id")
        .select(
          col("doc_id"), col("n_chars_real"), col("n_tokens"),
          round(col("n_distinct") / col("n_tokens"), 6).as("ttr"),
          round(col("n_stop") / col("n_tokens"), 6).as("stop_ratio"))
        .orderBy(col("doc_id"))
    },

    // -- higher-order array functions (transform/filter/exists/forall/
    //    aggregate — the HOF surface itself, over real token arrays).
    //    Tokens materialise ONCE in the first projection: HOFs are
    //    CodegenFallback and sit outside CSE, so embedding the split in
    //    each of the five would re-run lower()+regex 5× per row.
    //    Order-then-project (the text_winnow rule): the global orderBy
    //    runs its input twice (RangePartitioner sketch + real pass), so
    //    the interpreted HOF projection sits ABOVE the Sort — the
    //    exchange carries the raw (doc_id, text) rows and the five
    //    lambdas evaluate once per row. Measured 10.6 → ~6 s at 100×.
    "fn_hof" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        .select(
          col("doc_id"),
          graft.Oracle.json(
            transform(col("toks"), (t: Column) => length(t).cast("int"))).as("lens"),
          graft.Oracle.json(
            filter(col("toks"), (t: Column) => length(t) > 4)).as("long_toks"),
          exists(col("toks"), (t: Column) => length(t) <= 2).as("has_short"),
          forall(col("toks"), (t: Column) => t.rlike("^[a-z]+$")).as("all_alpha"),
          aggregate(col("toks"), lit(0L),
            (acc: Column, t: Column) => acc + length(t)).as("sum_lens"))
    },

    // -- corpus cleaning (C4-style quality gate) ----------------------------
    // The filter-pipeline form of text_quality — SAME signal definitions
    // via [[tokenStats]] — gating on all three emitted bands; verdict +
    // per-reason flags keep the drop set auditable (what a real
    // training-data pipeline ships).
    "text_clean" -> { (s, dir) =>
      Tables(s, dir, "documents").select(col("doc_id"))
        .join(tokenStats(s, dir), "doc_id")
        .withColumn("ttr", round(col("n_distinct") / col("n_tokens"), 6))
        .withColumn("stop_ratio", round(col("n_stop") / col("n_tokens"), 6))
        .withColumn("too_short", col("n_tokens") < 30)
        .withColumn("low_diversity", col("ttr") < 0.2)
        .withColumn("too_stoppy", col("stop_ratio") > 0.5)
        .withColumn("keep",
          !col("too_short") && !col("low_diversity") && !col("too_stoppy"))
        .select(col("doc_id"), col("n_tokens"), col("ttr"), col("stop_ratio"),
          col("too_short"), col("low_diversity"), col("too_stoppy"), col("keep"))
        .orderBy(col("doc_id"))
    },

    // -- PII masking (training-data scrubbing) -------------------------------
    // The corpus has no PII, so deterministic synthetic contact strings
    // are appended per doc first — the regexes then exercise end to end.
    // Patterns kept to the Java∩RE2 regex subset so both engines match
    // identically; counts + masked-text fingerprint are the outputs.
    "text_pii_mask" -> { (s, dir) =>
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "\\+[0-9][0-9-]{7,}"
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or +1-555-01"), col("doc_id")).as("t"))
        .select(
          col("doc_id"),
          regexp_count(col("t"), lit(emailRe)).cast("int").as("n_emails"),
          regexp_count(col("t"), lit(phoneRe)).cast("int").as("n_phones"),
          md5(regexp_replace(regexp_replace(col("t"), emailRe, "[EMAIL]"),
            phoneRe, "[PHONE]")).as("masked_fp"))
        .orderBy(col("doc_id"))
    },

    // -- document fingerprinting ---------------------------------------------
    // Whole-doc md5 + min shingle-md5 (a 1-hash MinHash): identical docs
    // share fp; near-identical docs usually share min_shingle_fp. Both
    // shingle signals are pure row functions, so they compute row-locally
    // (distinct 3-gram array per row → min md5 / size) instead of
    // shuffling the shingle relation through a groupBy + join back
    // (20.2 → 8.4 s at 100×). Docs with < 3 tokens stay NULL, exactly as
    // the old left join null-extended them; order-then-project shape.
    "text_fingerprint" -> { (s, dir) =>
      // UNFILTERED split — empties kept, the ONE tokenization the
      // shingle family and the oracle's string_split share (filtering
      // empties here would silently change shingle sets on texts with
      // consecutive spaces).
      val toks = split(lower(col("text")), " ")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), md5(col("text")).as("fp"), toks.as("t"))
        .select(col("doc_id"), col("fp"),
          when(size(col("t")) >= 3,
            array_distinct(transform(sequence(lit(1), size(col("t")) - 2),
              (i: Column) => concat_ws(" ", element_at(col("t"), i),
                element_at(col("t"), i + 1), element_at(col("t"), i + 2)))))
            .as("sh"))
        .select(col("doc_id"), col("fp"),
          array_min(transform(col("sh"), (x: Column) => md5(x)))
            .as("min_shingle_fp"),
          size(col("sh")).cast("long").as("n_shingles"))
    },

    // -- intra-document repetition signals (round 10) ------------------------
    // The Gopher repetition rules (Rae et al. 2021 §A1.1), token-adapted:
    // the most frequent bigram's share of bigram slots and the duplicate
    // fraction of trigram instances. Every signal is a pure function of
    // the row, so the whole computation runs in ONE fused expression
    // ([[graft.functions.RepetitionStats]]) — the earlier declarative
    // form shuffled every bigram instance through a (doc_id, bigram)
    // count + struct-max argmax + join back (31.8 s at 100× vs 3.5 fused);
    // the expression reproduces the same (count, then bytewise-greatest
    // bigram) tie rule the oracle's ORDER BY c DESC, bg DESC mirrors.
    // Order-then-project: the sort samples the raw scan, the expression
    // evaluates once above it.
    "text_repetition" -> { (s, dir) =>
      graft.functions.RepetitionStats.register(s)
      val toks = filter(split(lower(col("text")), " "),
        (t: Column) => t =!= "")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // the ≥3-non-empty-tokens gate as a CHEAP regex (three non-space
        // runs) so the optimizer pushing it below the Sort re-evaluates
        // a regex per pass, not the full split+filter tokenization —
        // exactly equivalent to size(filter(split(text," "),≠"")) >= 3
        // because non-empty tokens of a single-space split ARE the
        // maximal non-space runs
        .filter(col("text").rlike("[^ ]+ +[^ ]+ +[^ ]"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          graft.functions.RepetitionStats(toks).as("r"))
        .select(col("doc_id"),
          col("r.n_tokens").as("n_tokens"),
          col("r.top_bigram").as("top_bigram"),
          col("r.top_bigram_n").as("top_bigram_n"),
          round(col("r.top_bigram_n") / (col("r.n_tokens") - 1), 6)
            .as("top_bigram_frac"),
          round(col("r.n_tri_dup") / col("r.n_tri"), 6)
            .as("dup_trigram_frac"))
    },

    // -- token-distribution entropy (round 10) -------------------------------
    // Shannon entropy of each doc's token histogram — the standard
    // gibberish/boilerplate filter complementing ttr (low entropy =
    // repetitive/templated, near-log2(n) = no reuse at all). The
    // histogram is a pure row function, so the fused TokenStats
    // expression computes (n, n_distinct, Σ c·log2 c) in one per-row
    // pass — the earlier two-aggregate form shuffled every (doc_id,
    // token) pair. Float honesty: the Σ c·log2 c fold order (hashmap
    // iteration here, partial-agg order before, DuckDB's own order)
    // differs at ~1e-15; round(…, 6) absorbs it — the agg_corr budget.
    // Order-then-project: the sort samples the raw scan.
    "text_entropy" -> { (s, dir) =>
      // Nil lexicon: entropy never reads n_stop, so don't pay a
      // per-token stopword lookup for it. Distinct registry name —
      // "token_stats" is the Stopwords-lexicon registration
      // (tokenStats helper) and the registry is shared session state.
      graft.functions.TokenStats.register(s, Nil, "token_stats_nostop")
      val toks = filter(split(lower(col("text")), " "),
        (t: Column) => t =!= "")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // token-free docs had NO (doc_id, w) rows under the explode
        // form and were absent — gated by a CHEAP text predicate
        // (≥1 non-space char ⟺ ≥1 non-empty token) so the pushed-down
        // filter costs a trim per sort pass, not a tokenization
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
        .orderBy(col("doc_id"))
        .select(col("doc_id"),
          graft.functions.TokenStats(toks, "token_stats_nostop").as("ts"))
        .select(col("doc_id"),
          col("ts.n_tokens").as("n_tokens"),
          col("ts.n_distinct").as("n_distinct"),
          round(log(2.0, col("ts.n_tokens")) -
            col("ts.sclc") / col("ts.n_tokens"), 6).as("entropy"))
    },

    // -- cross-document repeated substrings (round 10) -----------------------
    // Character-level verbatim-overlap pairs — the ExactSubstr dedup idea
    // (Lee et al. 2022) in its k-gram relational form; see
    // [[graft.operators.SubstringDedup]] for the sort-free plan shape.
    "dedup_substring" -> { (s, dir) =>
      // spread: the gram explode + capped collect is the dominant
      // row-local stage and the fixture scan plans one task (round-18,
      // Tables.spread)
      graft.operators.SubstringDedup
        .candidates(Tables.spread(Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"))), mode = "exact")
        .orderBy(col("d1"), col("d2"))
    }
  )

  /** The near-dup pair CTE chain as SQL text (no ORDER BY) — shared by
    * the dedup_neardup and text_editdist oracles exactly as
    * [[nearDupPairs]] is shared on the Spark side.
    */
  private val nearDupPairsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') t FROM documents),
      |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
      |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      |sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id d1, b.doc_id d2, COUNT(*) i
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (SELECT d1, d2, jac FROM (
      |  SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) jac
      |  FROM inter JOIN sizes s1 ON d1 = s1.doc_id
      |             JOIN sizes s2 ON d2 = s2.doc_id)
      |WHERE jac >= 0.6)""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "dedup_neardup" ->
      s"""$nearDupPairsSql
         |SELECT d1, d2, jac FROM pairs ORDER BY d1, d2""".stripMargin,

    "dedup_doc_exact" ->
      """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies,
        |MIN(doc_id) AS keep_doc
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
        |sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id d1, b.doc_id d2, COUNT(*) i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |dirs AS (SELECT d1 src, d2 dst, i FROM inter
        |         UNION ALL SELECT d2, d1, i FROM inter)
        |SELECT src AS contained, dst AS container,
        |  ROUND(CAST(i AS DOUBLE) / n, 6) AS containment
        |FROM dirs JOIN sizes ON src = doc_id
        |WHERE CAST(i AS DOUBLE) / n >= 0.8
        |ORDER BY contained, container""".stripMargin,

    "text_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10),
        |corpus AS (SELECT doc_id, s FROM sh WHERE doc_id >= 10),
        |per_doc AS (SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY doc_id),
        |ov AS (SELECT doc_id, COUNT(*) AS n_overlap
        |       FROM corpus JOIN bench USING (s) GROUP BY doc_id)
        |SELECT p.doc_id, p.n_shingles,
        |COALESCE(ov.n_overlap, 0) AS n_overlap,
        |CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / p.n_shingles AS contamination,
        |CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / p.n_shingles >= 0.5 AS flagged
        |FROM per_doc p LEFT JOIN ov ON p.doc_id = ov.doc_id
        |ORDER BY p.doc_id""".stripMargin,

    "text_editdist" ->
      s"""$nearDupPairsSql
         |SELECT d1, d2, jac,
         |levenshtein(substr(ta.text, 1, 120), substr(tb.text, 1, 120)) AS dist,
         |1.0 - CAST(levenshtein(substr(ta.text, 1, 120), substr(tb.text, 1, 120)) AS DOUBLE)
         |      / greatest(length(substr(ta.text, 1, 120)), length(substr(tb.text, 1, 120))) AS sim
         |FROM pairs
         |JOIN documents ta ON d1 = ta.doc_id
         |JOIN documents tb ON d2 = tb.doc_id
         |ORDER BY d1, d2""".stripMargin,

    "sim_topk" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) e,
        |         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                                 CAST(embedding AS DOUBLE[]))) AS norm
        |  FROM embeddings),
        |q AS (SELECT vec_id qid, e qe, norm qnorm FROM n WHERE vec_id < 10),
        |cos AS (
        |  SELECT qid, vec_id,
        |         ROUND(list_inner_product(qe, e) / (qnorm * norm), 5) c
        |  FROM q JOIN n ON vec_id <> qid)
        |SELECT qid, rn, vec_id, c FROM (
        |  SELECT qid, vec_id, c,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, vec_id ASC) rn
        |  FROM cos)
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,

    "dedup_embed" ->
      """WITH n AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) e,
        |         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                                 CAST(embedding AS DOUBLE[]))) AS norm
        |  FROM embeddings)
        |SELECT v1, v2, c, label1, label2 FROM (
        |  SELECT a.vec_id v1, b.vec_id v2,
        |         ROUND(list_inner_product(a.e, b.e) / (a.norm * b.norm), 6) c,
        |         a.label label1, b.label label2
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |WHERE c >= 0.45 ORDER BY v1, v2""".stripMargin,

    "dedup_cluster" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
        |sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id d1, b.doc_id d2, COUNT(*) i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT d1, d2 FROM (
        |    SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (s1.n + s2.n - i), 6) jac
        |    FROM inter JOIN sizes s1 ON d1 = s1.doc_id
        |               JOIN sizes s2 ON d2 = s2.doc_id)
        |  WHERE jac >= 0.6),
        |edges AS (SELECT d1 v1, d2 v2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |verts AS (SELECT DISTINCT v1 AS v FROM edges),
        |reach(v, r) AS (
        |  SELECT v, v FROM verts
        |  UNION
        |  SELECT e.v1, reach.r FROM edges e JOIN reach ON e.v2 = reach.v)
        |SELECT v AS doc_id, MIN(r) AS cluster_id, (v = MIN(r)) AS is_canonical
        |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin,

    "text_pii_mask" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or +1-555-01' || doc_id AS t
        |  FROM documents)
        |SELECT doc_id,
        |CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
        |CAST(len(regexp_extract_all(t, '\+[0-9][0-9-]{7,}')) AS INT) AS n_phones,
        |md5(regexp_replace(regexp_replace(t,
        |  '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |  '\+[0-9][0-9-]{7,}', '[PHONE]', 'g')) AS masked_fp
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      s"""SELECT token, COUNT(*) AS n FROM (
         |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
         |WHERE token <> '' AND token NOT IN $stopSqlList
         |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,

    "text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 4) AS avg_chars,
        |MIN(LENGTH(text)) AS min_len, MAX(LENGTH(text)) AS max_len,
        |COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_quality" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
         |stats AS (
         |  SELECT doc_id, COUNT(*) n_tokens, COUNT(DISTINCT w) n_distinct,
         |         COUNT(*) FILTER (w IN $stopSqlList) n_stop
         |  FROM tok GROUP BY doc_id)
         |SELECT d.doc_id, LENGTH(d.text) AS n_chars_real, n_tokens,
         |       ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS ttr,
         |       ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio
         |FROM documents d JOIN stats USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "fn_hof" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents)
        |SELECT doc_id,
        |to_json(list_transform(toks, x -> CAST(length(x) AS INT))) AS lens,
        |to_json(list_filter(toks, x -> length(x) > 4)) AS long_toks,
        |len(list_filter(toks, x -> length(x) <= 2)) > 0 AS has_short,
        |len(list_filter(toks, x -> NOT regexp_matches(x, '^[a-z]+$'))) = 0 AS all_alpha,
        |CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_lens
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_clean" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
         |stats AS (
         |  SELECT doc_id, COUNT(*) n_tokens, COUNT(DISTINCT w) n_distinct,
         |         COUNT(*) FILTER (w IN $stopSqlList) n_stop
         |  FROM tok GROUP BY doc_id),
         |sig AS (
         |  SELECT d.doc_id, n_tokens,
         |         ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS ttr,
         |         ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio
         |  FROM documents d JOIN stats USING (doc_id))
         |SELECT doc_id, n_tokens, ttr, stop_ratio,
         |       n_tokens < 30 AS too_short,
         |       ttr < 0.2 AS low_diversity,
         |       stop_ratio > 0.5 AS too_stoppy,
         |       NOT (n_tokens < 30) AND NOT (ttr < 0.2)
         |         AND NOT (stop_ratio > 0.5) AS keep
         |FROM sig ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
        |minsh AS (
        |  SELECT doc_id, MIN(md5(s)) min_shingle_fp, COUNT(*) n_shingles
        |  FROM sh GROUP BY doc_id)
        |SELECT d.doc_id, md5(d.text) AS fp, min_shingle_fp, n_shingles
        |FROM documents d LEFT JOIN minsh USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text), ' '),
        |                             x -> x <> '') AS t
        |  FROM documents),
        |base AS (SELECT doc_id, t, len(t) AS n_tokens FROM toks
        |         WHERE len(t) >= 3),
        |big AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        |  FROM base, LATERAL unnest(generate_series(1, len(t)-1)) AS u(i)),
        |bgc AS (SELECT doc_id, bg, COUNT(*) c FROM big GROUP BY 1, 2),
        |top AS (
        |  SELECT doc_id, bg AS top_bigram, c AS top_bigram_n FROM (
        |    SELECT doc_id, bg, c,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id
        |                         ORDER BY c DESC, bg DESC) rn
        |    FROM bgc) WHERE rn = 1),
        |tri AS (
        |  SELECT doc_id, n_tokens,
        |    len(t) - 2 AS n_tri,
        |    len(t) - 2 - len(list_distinct(list_transform(
        |      generate_series(1, len(t)-2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS n_tri_dup
        |  FROM base)
        |SELECT tri.doc_id, tri.n_tokens, top.top_bigram,
        |  CAST(top.top_bigram_n AS BIGINT) AS top_bigram_n,
        |  ROUND(CAST(top.top_bigram_n AS DOUBLE) / (tri.n_tokens - 1), 6)
        |    AS top_bigram_frac,
        |  ROUND(CAST(tri.n_tri_dup AS DOUBLE) / tri.n_tri, 6)
        |    AS dup_trigram_frac
        |FROM tri JOIN top USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // DuckDB log2() vs Spark's ln(x)/ln 2: last-ulp disagreement per
    // term, absorbed by round(…, 6) after the fold (see the query's
    // float-honesty note).
    "text_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |  FROM documents),
        |wc AS (SELECT doc_id, w, COUNT(*) c FROM toks
        |       WHERE w <> '' GROUP BY 1, 2),
        |agg AS (SELECT doc_id, SUM(c) n, COUNT(*) n_distinct,
        |               SUM(c * log2(CAST(c AS DOUBLE))) s
        |        FROM wc GROUP BY 1)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  ROUND(log2(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE), 6)
        |    AS entropy
        |FROM agg ORDER BY doc_id""".stripMargin,

    // Exact string grams here vs xxhash64'd grams on the Spark side:
    // equality up to 64-bit collisions (~10^-10 at fixture gram counts —
    // the hashed-shingle Jaccard budget), and the sf0.01 corpus is far
    // under the drop-whole cap (max gram group = 3), so the capped scale
    // path and this uncapped oracle agree exactly.
    "dedup_substring" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, substr(text, i, 40) AS gr
        |  FROM documents,
        |       LATERAL unnest(generate_series(1, length(text)-39)) AS t(i)
        |  WHERE length(text) >= 40)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
        |FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 5
        |ORDER BY d1, d2""".stripMargin
  )
}
