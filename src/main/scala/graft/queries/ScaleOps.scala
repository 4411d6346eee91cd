package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.{Ann, ConnectedComponents, EmbedDedup, Ivf, Multimodal, MinHash, Pq, Sampling, SimHash, SimIndexes}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path / probabilistic operators exposed as rows-only queries
  * (held to fixture-equality and recall unit tests, SURVEY.md §7.5):
  * MinHash-LSH and SimHash near-dup, hyperplane-LSH ANN, heuristic
  * language ID, and the multimodal metadata pipeline. `text_langid` is
  * the exception — deterministic end-to-end, so it carries a full DuckDB
  * oracle ([[oracle]]) since r10.
  */
object ScaleOps {
  type Q = (SparkSession, String) => DataFrame

  /** The sim `_idx` rows' artifact base — the [[Extra9.artifactDir]]
    * memo → artifact → build rationale, sim-family side; shared with
    * sim_ann_cold so the cold row and the `_idx` rows serve the same
    * committed artifact.
    */
  private def simArtifact(s: SparkSession, dir: String): Option[String] =
    Some(s"${Extra10.artifactBase(s, dir)}/sim")

  private def tokens(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")


  /** (doc_id, 64-bit-hashed distinct shingle) — the MinHash input: every
    * downstream shuffle moves 8-byte keys instead of ~30-byte strings.
    * `private[graft]` so StreamingMinHashSpec asserts stream parity
    * against THIS production pipeline, not a hand-copied twin that could
    * drift.
    */
  private[graft] def hashedShingles(s: SparkSession, dir: String): DataFrame =
    LlmOps.shingleRowsRaw(s, dir)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
      .distinct()

  private[graft] def normalized(s: SparkSession, dir: String): DataFrame = {
    val e = transform(col("embedding"), (x: Column) => x.cast("double"))
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), e.as("e"))
      .withColumn("norm", sqrt(aggregate(
        transform(col("e"), (x: Column) => x * x),
        lit(0.0), (acc: Column, x: Column) => acc + x)))
  }

  val queries: Map[String, Q] = Map(
    // MinHash-LSH near-dup, exact-verified: equals dedup_neardup up to
    // LSH recall (tested); at 100 TB this is the only tractable path.
    // Signatures are computed ROW-LOCALLY from the text (zero shuffle —
    // the aggregate formulation shuffles the whole shingle relation;
    // proven bit-identical in StreamingMinHashSpec/ScaleOpsSpec); the
    // hashed shingle relation is still built for sizes + exact verify,
    // with 8-byte keys so every remaining shuffle moves longs, not
    // ~30-byte strings. Jaccard over hashed shingles equals string
    // Jaccard up to 64-bit collisions (~n²/2^64 — negligible).
    "dedup_minhash" -> { (s, dir) =>
      MinHash.nearDuplicatesFromText(
          Tables(s, dir, "documents"), hashedShingles(s, dir), threshold = 0.6)
        .orderBy(col("d1"), col("d2"))
    },

    // The FULL scale dedup pipeline: MinHash-LSH pairs → large-star/
    // small-star connected components → cluster id + canonical doc.
    // Equals the exact dedup_cluster up to LSH recall (tested equal on
    // the fixtures, where recall is 1).
    "dedup_minhash_cluster" -> { (s, dir) =>
      val edges = MinHash.nearDuplicatesFromText(
          Tables(s, dir, "documents"), hashedShingles(s, dir), threshold = 0.6)
        .select(col("d1").as("src"), col("d2").as("dst"))
      ConnectedComponents.clusterLabels(ConnectedComponents.componentsStar(edges))
        .orderBy(col("doc_id"))
    },

    // SimHash fingerprints + banded Hamming pairs (exact for dist ≤ 3).
    // Fingerprints are row-local (zero shuffle before the band join —
    // equality-tested against the grouped form in ScaleOpsSpec).
    "dedup_simhash" -> { (s, dir) =>
      SimHash.nearDuplicatesFromText(Tables(s, dir, "documents"),
          maxDist = 3, bands = 4)
        // eager checkpoint before the oracle orderBy (the round-14
        // audit's rule: expensive multi-stage input + small result ⇒
        // checkpoint, or the global sort's RangePartitioner sketch runs
        // the band self-join twice; MinHash checkpoints inside the
        // operator, SimHash's lazy return checkpoints here)
        .localCheckpoint()
        .orderBy(col("d1"), col("d2"))
    },

    // Hyperplane-LSH approximate top-5 neighbours for queries vec_id<10.
    // 16 tables × 6 planes with 2 multi-probe flips (+ the pair probe):
    // the measured sweet spot (SweepIvf r6 grid: recall@5 = 0.972 at 320
    // candidates/query — ABOVE the 32-table config's 0.948 at 314, with
    // HALF its data-side index).
    "sim_ann" -> { (s, dir) =>
      val n = normalized(s, dir)
      Ann.lshTopK(n.filter(col("vec_id") < 10), n, k = 5,
          planesPerTable = 6, nprobe = 2)
        // eager checkpoint before the oracle orderBy (round-14 audit):
        // the top-k result is ~50 rows, but un-checkpointed the sort's
        // sketch pass re-runs the whole candidate pipeline
        .localCheckpoint()
        .orderBy(col("qid"), col("rn"))
    },

    // Product-quantized ANN: 16 one-byte sub-codes per vector (a binary
    // column) replace the 64-double embedding on the data side — the
    // shuffle/storage compression layer of the similarity menu
    // (brute/LSH/IVF/PQ). Codebooks train on a bounded driver-side
    // sample; unit-normalized inputs make ascending ADC L2 rank like
    // descending cosine. (16, 256) is the measured dial's knee on the
    // adversarial uniform fixture — recall@5 0.71 at 16 bytes/vec = 32×
    // (SweepIvf PQ grid; real clustered corpora do far better).
    "sim_pq" -> { (s, dir) =>
      val n = Pq.unitNormalized(
        normalized(s, dir).select(col("vec_id"), col("e")))
      val cb = Pq.train(n, m = 16, ksub = 256)
      Pq.topK(n.filter(col("vec_id") < 10), Pq.encode(n, cb), cb, k = 5)
        // eager checkpoint before the oracle orderBy (round-14 audit):
        // the top-k result is ~50 rows, but un-checkpointed the sort's
        // sketch pass re-runs the whole candidate pipeline
        .localCheckpoint()
        .orderBy(col("qid"), col("rn"))
    },

    // IVF-PQ: the production composition — IVF cells prune candidate
    // COUNT (nprobe of nlist cells per query), PQ codes prune candidate
    // BYTES (16-byte codes through the cell join, never embeddings).
    "sim_ivf_pq" -> { (s, dir) =>
      val n = Pq.unitNormalized(
        normalized(s, dir).select(col("vec_id"), col("e")))
      Pq.ivfPqTopK(n.filter(col("vec_id") < 10), n, k = 5)
        // eager checkpoint before the oracle orderBy (round-14 audit):
        // the top-k result is ~50 rows, but un-checkpointed the sort's
        // sketch pass re-runs the whole candidate pipeline
        .localCheckpoint()
        .orderBy(col("qid"), col("rn"))
    },

    // -- embedding near-dup, the unbounded-scale path --------------------
    // SemDeDup-shaped: IVF cells block the corpus (fused assign, linear
    // in n at fixed target cell size), exact full-precision cosine ONLY
    // within a cell — zero false positives, recall loss confined to
    // cross-cell pairs (measured in EmbedDedupSpec) and capped hot cells.
    // The all-pairs dedup_embed stays the bounded-slice baseline.
    "dedup_embed_cells" -> { (s, dir) =>
      val n = normalized(s, dir).select(col("vec_id"), col("e"))
      // nlist scales with the corpus (fixed ~250-row mean cell) — the
      // linearity dial; the count is one cheap metadata-backed pass
      // eager checkpoint BEFORE the oracle orderBy (the nearDupPairs
      // rule): a global sort evaluates its input twice (RangePartitioner
      // sketch + real pass), and the input here is the whole blocking
      // pipeline — the checkpoint makes the second pass a cheap RDD scan
      EmbedDedup.cellPairs(n, threshold = 0.45, nlist = EmbedDedup.autoNlist(n.count()))
        .localCheckpoint()
        .orderBy(col("v1"), col("v2"))
    },

    // -- embedding near-dup, the boundary-tight-regime path ---------------
    // Random-hyperplane LSH blocking (round 13): distance-calibrated
    // collision instead of cluster geometry — the regime round-12's
    // sweep proved canopies lose (recall topped out ~0.6 for more than
    // exact cost at the θ=0.45 adversarial fixture). Same contract as
    // dedup_embed_cells; exact-verified candidates, zero false
    // positives; recall floor measured in EmbedDedupSpec.
    "dedup_embed_lsh" -> { (s, dir) =>
      val n = normalized(s, dir).select(col("vec_id"), col("e"))
      // planes scale with the corpus (the autoNlist rule — a fixed
      // plane count goes quadratic exactly like a fixed nlist). The
      // default autoPlanes dial is the MEASURED winner at 20k/θ=0.45:
      // 0.99 recall @ 7.5 s vs the exact kernel's 12.2 s and the best
      // canopy's 0.93 @ 26 s. Recall at fixed (tables, nprobe) decays
      // as planes grow with n (p^planes per table) — the designed
      // trade; raise tables/nprobe to buy it back (EmbedDedup
      // scaladoc's dial table).
      // eager checkpoint before the oracle orderBy (the nearDupPairs
      // rule — see dedup_embed_cells): without it the global sort runs
      // the whole bucket join TWICE (measured: 168 s vs the sweep's
      // 97 s for the same dial at the 100× capstone)
      EmbedDedup.lshPairs(n, threshold = 0.45,
          planesPerTable = EmbedDedup.autoPlanes(n.count()))
        .localCheckpoint()
        .orderBy(col("v1"), col("v2"))
    },

    // Cells → pairs → connected components: the full semantic-dedup
    // pipeline (cluster id + canonical member), dedup_cluster's contract
    // over the embedding pair graph.
    "dedup_embed_cluster" -> { (s, dir) =>
      val n = normalized(s, dir).select(col("vec_id"), col("e"))
      EmbedDedup.clusters(n, threshold = 0.45, nlist = EmbedDedup.autoNlist(n.count()))
        .orderBy(col("doc_id"))
    },

    // -- steady-state (prebuilt-index) similarity siblings ---------------
    // Same operators, same dials, same results (spec-gated equal to the
    // build-included forms) — but the index comes from the SimIndexes
    // session cache via memo → committed parquet artifact → build
    // (round-17 verdict #2; the Extra9.artifactDir rationale): built+
    // persisted+saved on a true cold start, loaded off disk by every
    // later driver, memo-served within a session. In the
    // bench's two time-separated sweeps, sweep 1 pays the build and sweep
    // 2 is steady state, so the min-of-2 official number IS the amortized
    // production cost, reported next to the build-included sibling's
    // one-shot cost. That split is the 100 TB serving story: one index
    // build per corpus snapshot, many query batches against it.
    "sim_ann_idx" -> { (s, dir) =>
      val n = normalized(s, dir)
      val ix = SimIndexes.ann(n.select(col("vec_id"), col("e")), s"$dir#raw",
        planesPerTable = 6, artifact = simArtifact(s, dir))
      Ann.lshTopK(n.filter(col("vec_id") < 10), n, k = 5,
          planesPerTable = 6, nprobe = 2, index = Some(ix))
        // eager checkpoint before the oracle orderBy (round-14 audit):
        // the top-k result is ~50 rows, but un-checkpointed the sort's
        // sketch pass re-runs the whole candidate pipeline
        .localCheckpoint()
        .orderBy(col("qid"), col("rn"))
    },

    "sim_ivf_idx" -> { (s, dir) =>
      val n = normalized(s, dir).select(col("vec_id"), col("e"))
      val ix = SimIndexes.ivf(n, s"$dir#raw", artifact = simArtifact(s, dir))
      Ivf.topK(n.filter(col("vec_id") < 10), n, k = 5, index = Some(ix))
        // eager checkpoint before the oracle orderBy (round-14 audit):
        // the top-k result is ~50 rows, but un-checkpointed the sort's
        // sketch pass re-runs the whole candidate pipeline
        .localCheckpoint()
        .orderBy(col("qid"), col("rn"))
    },

    "sim_pq_idx" -> { (s, dir) =>
      val n = Pq.unitNormalized(
        normalized(s, dir).select(col("vec_id"), col("e")))
      val (cb, encoded) = SimIndexes.pq(n, s"$dir#unit",
        artifact = simArtifact(s, dir))
      Pq.topK(n.filter(col("vec_id") < 10), encoded, cb, k = 5)
        // eager checkpoint before the oracle orderBy (round-14 audit):
        // the top-k result is ~50 rows, but un-checkpointed the sort's
        // sketch pass re-runs the whole candidate pipeline
        .localCheckpoint()
        .orderBy(col("qid"), col("rn"))
    },

    "sim_ivf_pq_idx" -> { (s, dir) =>
      val n = Pq.unitNormalized(
        normalized(s, dir).select(col("vec_id"), col("e")))
      val ix = SimIndexes.ivfPq(n, s"$dir#unit",
        artifact = simArtifact(s, dir))
      Pq.ivfPqTopK(n.filter(col("vec_id") < 10), n, k = 5, index = Some(ix))
        // eager checkpoint before the oracle orderBy (round-14 audit):
        // the top-k result is ~50 rows, but un-checkpointed the sort's
        // sketch pass re-runs the whole candidate pipeline
        .localCheckpoint()
        .orderBy(col("qid"), col("rn"))
    },

    // Reproducible hash-bucket sampling + deterministic 3-way split:
    // per lang, original count, ~30% sample count, and the train/val/
    // test assignment counts. Stable across runs/partitionings by
    // construction (rows-only: DuckDB's hash differs by design).
    "sample_hash" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val sampled = Sampling.bernoulli(docs, col("doc_id"), 0.3)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
      val splits = docs
        .withColumn("split", Sampling.split(col("doc_id"), 0.8, 0.1))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          count_if(col("split") === "train").as("n_train"),
          count_if(col("split") === "val").as("n_val"),
          count_if(col("split") === "test").as("n_test"))
      splits.join(sampled, Seq("lang"), "left").orderBy(col("lang"))
    },

    // IVF coarse-quantisation ANN: probe 4 of 8 cells per query.
    "sim_ivf" -> { (s, dir) =>
      val n = normalized(s, dir).select(col("vec_id"), col("e"))
      Ivf.topK(n.filter(col("vec_id") < 10), n, k = 5)
        // eager checkpoint before the oracle orderBy (round-14 audit):
        // the top-k result is ~50 rows, but un-checkpointed the sort's
        // sketch pass re-runs the whole candidate pipeline
        .localCheckpoint()
        .orderBy(col("qid"), col("rn"))
    },

    // Marker-lexicon language ID + token counts per document. Bulk form:
    // one explode + broadcast-join + argmax pass over the corpus instead
    // of five interpreted HOF scans per row (per-row Column fn exists for
    // single-value use; the two agree — ScaleOpsSpec). Every column is
    // deterministic and engine-portable (portable md5-prefix fingerprint,
    // RE2-expressible token regex), so this row carries a full DuckDB
    // oracle since r10 — the marker argmax mirrors as list_filter scores
    // + a declared-priority CASE.
    "text_langid" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      docs
        .withColumn("toks", split(lower(col("text")), TextAnalysis.WsPlus))
        .select(col("doc_id"), col("lang").as("declared_lang"),
          size(filter(col("toks"), (t: Column) => t =!= "")).as("n_tokens_ws"),
          TextAnalysis.tokenCountBpeIsh(col("text")).as("n_tokens_bpeish"),
          TextAnalysis.fingerprintPortable(col("text")).as("fp"))
        .join(TextAnalysis.languageIdBulk(docs, "doc_id", "text"), "doc_id")
        .select(col("doc_id"), col("declared_lang"), col("guessed_lang"),
          col("n_tokens_ws"), col("n_tokens_bpeish"), col("fp"))
        .orderBy(col("doc_id"))
    },

    // Multimodal metadata pipeline over a deterministic synthetic media
    // table (no media fixture exists): decode → meta + frame sampling.
    "multimodal_meta" -> { (s, _) =>
      val media = Multimodal.synthetic(s, 64)
      val meta = Multimodal.decodeMeta(media).toDF()
      val frames = Multimodal.sampleFrames(media).toDF()
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
      meta.join(frames, Seq("media_id"), "left")
        .orderBy(col("media_id"))
    },

    // Per-frame analysis over the sampled-frame relation (round 15):
    // the explode-shaped multimodal lane SURFACED per frame instead of
    // count-folded (multimodal_meta keeps only n_frames): one media row
    // in → duration-many frame rows out through sampleFrames, then a
    // per-media window computes the consecutive-frame cosine — the
    // scene-change signal, the shape a video pipeline runs at 100 TB.
    // Scale shape: the explode is bounded by the maxFrames cap (never
    // unbounded fan-out), the window partitions by media_id so ranking
    // shuffles only (media, frame) rows, and the feature stays an
    // 8-float array through the lag. Deterministic (the stub codec's
    // frame features are seeded by (media_id, frame_idx)); rows-only —
    // the codec seam isn't portable SQL.
    "multimodal_frames" -> { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      graft.functions.CosineSimilarity.register(s)
      val frames = Multimodal.sampleFrames(Multimodal.synthetic(s, 64)).toDF()
      val fd = transform(col("feature"), (x: Column) => x.cast("double"))
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
      frames
        .withColumn("f", fd)
        .withColumn("feat_norm", round(sqrt(aggregate(col("f"), lit(0.0),
          (a: Column, x: Column) => a + x * x)), 5))
        .withColumn("prev", lag(col("f"), 1).over(w))
        .withColumn("delta_cos",
          when(col("prev").isNotNull,
            round(graft.functions.CosineSimilarity(col("f"), col("prev")), 5)))
        .select(col("media_id"), col("frame_idx"), col("feat_norm"),
          col("delta_cos"))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // The same metadata pipeline over REAL image bytes (r6): tiny
    // executor-generated PNG/BMP rasters decoded by the ImageIO codec —
    // the stub seam and the real-decoder seam run the identical
    // operators. Content features come from the decoded raster, so the
    // embedding column composes with the ANN path on genuine pixels.
    "multimodal_image_meta" -> { (s, _) =>
      val media = Multimodal.syntheticImages(s, 48)
      val codec = Multimodal.ImageIoCodec
      val meta = Multimodal.decodeMeta(media, codec).toDF()
      val feats = Multimodal.extractFeatures(media, dim = 8, codec)
        .select(col("media_id"),
          round(aggregate(col("embedding"),
            lit(0.0), (a: Column, x: Column) => a + x * x), 5).as("feat_sq_norm"))
      meta.join(feats, Seq("media_id"), "left")
        .orderBy(col("media_id"))
    },

    // Perceptual-hash image dedup (round 12): real ImageIO rasters →
    // row-local 64-bit dHash → pigeonhole-banded Hamming pairs. The
    // image analogue of dedup_simhash: envelope-invariant (the planted
    // PNG↔BMP same-raster dups land at distance 0) and locality-
    // preserving (the one-pixel-nudged dups land within the band
    // guarantee). No SQL oracle (image decode isn't portable SQL);
    // ScaleOpsSpec pins envelope invariance, the near-dup recovery, and
    // banded ≡ brute-force exactness.
    "multimodal_phash" -> { (s, _) =>
      val media = Multimodal.syntheticImagesWithDups(s, 48)
      val hashes = Multimodal.dHash(media, Multimodal.ImageIoCodec)
      Multimodal.phashDupes(hashes, maxDistance = 6)
        .orderBy(col("id1"), col("id2"))
    },

    // Image duplicate CLUSTERS (round 12): phash pairs → large-star/
    // small-star connected components → (doc_id, cluster_id,
    // is_canonical) — the dedup_cluster contract over the image pair
    // graph, so the multimodal dedup story composes end to end exactly
    // like the text/embedding ones (screen → pairs → clusters →
    // canonical member). Rows-only; ScaleOpsSpec pins clusters ≡ CC
    // over the operator's own pairs.
    "multimodal_phash_cluster" -> { (s, _) =>
      val media = Multimodal.syntheticImagesWithDups(s, 48)
      val edges = Multimodal
        .phashDupes(Multimodal.dHash(media, Multimodal.ImageIoCodec),
          maxDistance = 6)
        .select(col("id1").as("src"), col("id2").as("dst"))
      graft.operators.ConnectedComponents
        .clusterLabels(graft.operators.ConnectedComponents.componentsStar(edges))
        .orderBy(col("doc_id"))
    }
  )

  /** The one ScaleOps row with a DuckDB oracle (r10): `text_langid` is
    * fully deterministic, unlike the approximate/recall-gated rest of
    * this map. Marker score expressions and the declared-priority CASE
    * are GENERATED from [[TextAnalysis.Markers]], so the oracle lexicon
    * can never drift from the engine's. The CASE encodes the same argmax
    * as `languageIdTokens`' left-to-right max scan: a language wins iff
    * its score is positive and ≥ every LATER language's score (an
    * earlier language that beat it would have taken its branch first).
    */
  val oracle: Map[String, String] = {
    val score = TextAnalysis.Markers.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(t, x -> x IN ($lst))) AS s_$lang"
    }.mkString(",\n    ")
    val langs = TextAnalysis.Markers.map(_._1)
    val cases = langs.zipWithIndex.map { case (lang, i) =>
      val later = langs.drop(i + 1)
      val cond = (s"s_$lang > 0" +: later.map(l => s"s_$lang >= s_$l"))
        .mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString("\n    ")
    Map(
      "text_langid" ->
        s"""WITH toks AS (
           |  SELECT doc_id, lang, text, string_split_regex(lower(text), '${TextAnalysis.WsPlus}') AS t
           |  FROM documents),
           |scored AS (
           |  SELECT doc_id, lang, text, t,
           |    $score
           |  FROM toks)
           |SELECT doc_id,
           |  lang AS declared_lang,
           |  CASE
           |    $cases
           |    ELSE 'und'
           |  END AS guessed_lang,
           |  len(list_filter(t, x -> x <> '')) AS n_tokens_ws,
           |  len(regexp_extract_all(text, '${TextAnalysis.BpeIshPattern}')) AS n_tokens_bpeish,
           |  CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS fp
           |FROM scored""".stripMargin)
  }
}
