package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity join via partition-based segment
  * blocking (the PassJoin scheme — Li, Deng & Feng, VLDB 2011): all
  * pairs with `levenshtein ≤ k`, found WITHOUT the quadratic
  * all-pairs pass and WITHOUT probabilistic recall. The reference
  * (/root/reference/task.ts) has no analogue; this is the exact scale
  * sibling of the declared-baseline `text_editdist` contract, which
  * confines levenshtein to MinHash CANDIDATE pairs and therefore
  * inherits LSH's recall curve — this operator's candidate set is a
  * superset of the true result by construction, so recall is exactly 1.
  *
  * Why it is exact (pigeonhole): partition a string s into k+1
  * contiguous segments. Any t with ed(s,t) ≤ k aligns to s by ≤ k
  * edit operations, each of which touches at most one segment, so at
  * least one segment of s survives UNEDITED as a contiguous substring
  * of t; and the surviving segment's position shift δ plus the
  * remaining length change |Δ − δ| are produced by DISJOINT edit sets,
  * so |δ| + |Δ − δ| ≤ k — the TIGHT ~k+1-wide probe window (the naive
  * ±k window is 2k+1). Candidates are then verified with the
  * THRESHOLD levenshtein (banded O(k·n) DP, -1 past k) — verification
  * only ever sees blocked candidates.
  *
  * Scale shape (the 100 TB lens): both sides are map-side expansions —
  * k+1 segment rows per indexed string, O(k²) windowed probe
  * substrings per probed string per plausible source length — meeting
  * in ONE equi hash join on xxhash64(source length, slot, segment
  * bytes) — the three-part key folded into one 8-byte column, round-18
  * guide §2.3; collisions only widen the VERIFIED candidate set —
  * pinned SHUFFLE_HASH (the exploded probe relation's size is
  * invisible to the planner — Generate breaks stats — and a mis-chosen
  * broadcast of the large side builds the whole expansion as one
  * driver-resident hashed relation; measured 54.9 → 18.0 s at sf0.1),
  * then a distinct on the candidate pair ids and a row-local verify.
  * Probe generation is three chained CODEGEN stages (length fan-out
  * join → slot explode → position explode), not one nested
  * higher-order lambda — the interpreted triple-transform first cut
  * re-evaluated the segment geometry per position element and
  * dominated the runtime (18.0 → 5.2 s at sf0.1). No sort, no
  * cartesian in the hot path, no driver collect; the plan is gated
  * (PlanSpec). Skew: a boilerplate segment shared by a hot template
  * family concentrates its (len, slot, seg) key exactly like the
  * substring-dedup gram buckets — those keys are real candidate mass
  * (every doc in the family IS a near-match of the others), so unlike
  * the screening operators there is no correct whole-bucket drop; a
  * 100 TB run faced with a pathological family should exact-dedup
  * identical prefixes first (the phash rule: duplicate mass belongs in
  * a hash-groupBy, not a candidate join), which
  * [[graft.queries.LlmOps]]'s dedup_exact stage provides.
  *
  * Short strings (len ≤ k) get the pigeonhole from the OTHER side or
  * no pigeonhole at all, and are handled exactly rather than excluded:
  * a pair with both sides ≤ k always satisfies ed ≤ max(len) ≤ k, so
  * the short×short stratum is emitted wholesale — grouped by the
  * string first, so the non-equi compare is quadratic only in
  * DISTINCT ≤ k-char strings, never in their multiplicity (crawl data
  * is dense in empty/near-empty docs; ADVICE r15), with duplicate
  * mass fanning out row-locally after the one verify per distinct
  * pair. A long×short pair is caught by the long side's segments
  * probed in the short string (the probe generator's source-length
  * window [len−k, len+k] covers the longer source).
  */
object EditDistJoin {
  /** Index side: the k+1 even segments per string. Segment i of an
    * L-char string spans 1-based positions
    * [floor(iL/(k+1))+1, floor((i+1)L/(k+1))] — the deterministic even
    * partition the probe generator mirrors. Requires len > k (every
    * segment non-empty).
    *
    * The emitted join key is `keyh = xxhash64(srclen, slot, seg)` — the
    * whole three-part equality folded into ONE 8-byte column (round-18,
    * guide §2.3: shuffle keys, not payloads; the probe expansion is the
    * join's dominant shuffle and its variable-length substring column
    * was most of every row). A hash COLLISION only ever widens the
    * candidate set, and every candidate is verified with the banded
    * levenshtein before anything is emitted, so the operator's output
    * is identical — the blocking stays exact-recall by pigeonhole, and
    * precision is restored by the verify either way.
    */
  private def segRelation(longs: DataFrame, k: Int): DataFrame =
    longs.select(
      col("id").as("sid"), col("len").as("srclen"),
      explode(transform(sequence(lit(0), lit(k)), i => {
        val st = (floor(i * col("len") / (k + 1)) + 1).cast("int")
        val en = floor((i + 1) * col("len") / (k + 1)).cast("int")
        struct(i.cast("int").as("slot"),
          col("t").substr(st, en - st + 1).as("seg"))
      })).as("sg"))
      .select(col("sid"), col("srclen"),
        xxhash64(col("srclen"), col("sg.slot"), col("sg.seg")).as("keyh"))

  /** Probe side: for every source length that EXISTS in the indexed
    * relation (broadcast of the distinct-length relation — bounded by
    * the length domain, which an edit-distance contract caps by
    * construction) within ±k of this string's length, every slot's
    * windowed substrings. Three chained codegen stages; see the object
    * scaladoc for why this beats a nested higher-order lambda.
    */
  private def probeRelation(base: DataFrame, lens: DataFrame,
                            k: Int): DataFrame = {
    val kp1 = k + 1
    val slotted = base.join(broadcast(lens),
        abs(col("len") - col("srclen")) <= k)
      .select(col("id").as("tid"), col("len").as("plen"), col("t"),
        col("srclen"), explode(lit((0 to k).toArray)).as("slot"))
      .withColumn("st",
        (floor(col("slot") * col("srclen") / kp1) + 1).cast("int"))
      .withColumn("slen",
        floor((col("slot") + 1) * col("srclen") / kp1).cast("int") -
          col("st") + 1)
      .withColumn("delta", col("plen") - col("srclen"))
      .withColumn("lo", greatest(
        col("st") - ceil((lit(k) - col("delta")) / 2.0).cast("int"), lit(1)))
      .withColumn("hi", least(
        col("st") + floor((lit(k) + col("delta")) / 2.0).cast("int"),
        col("plen") - col("slen") + 1))
      .filter(col("slen") >= 1 && col("hi") >= col("lo"))
    slotted
      .select(col("tid"), col("plen"), col("srclen"), col("slot"),
        col("t"), col("slen"),
        explode(sequence(col("lo"), col("hi"))).as("p"))
      // keyh mirrors [[segRelation]]'s folded key — the probe expansion
      // is the join's dominant shuffle, and one 8-byte hash replaces
      // (srclen int, slot int, variable-length substring) per row
      .select(col("tid"), col("plen"),
        xxhash64(col("srclen"), col("slot"),
          col("t").substr(col("p"), col("slen"))).as("keyh"))
  }

  private def prepared(docs: DataFrame): DataFrame =
    docs.select(col("id"), col("t"), length(col("t")).as("len"))

  /** All unordered pairs of `docs` rows with levenshtein(t) ≤ k.
    *
    * @param docs (id: integral, t: string) — one row per string; ids
    *             unique (pairs are reported as d1 < d2 by id).
    * @return (d1, d2, len1, len2, dist) ordered nowhere — callers sort.
    */
  def pairs(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"edit-distance threshold must be >= 1, got $k")
    val base = prepared(docs)
    val longs = base.filter(col("len") > k)
    val shorts = base.filter(col("len") <= k)

    val segs = segRelation(longs, k)
    val probes = probeRelation(base,
      longs.select(col("len").as("srclen")).distinct(), k)

    // Long probes only need the sid < tid direction (for a long-long
    // pair the pigeonhole holds from BOTH sides, so the lower-id-indexes
    // orientation finds it exactly once per matching key); short probes
    // keep both (only the long side can index).
    val cand = segs.hint("shuffle_hash").join(probes,
        segs("keyh") === probes("keyh") &&
          (probes("plen") <= k || segs("sid") < probes("tid")) &&
          segs("sid") =!= probes("tid"))
      .select(least(col("sid"), col("tid")).as("d1"),
        greatest(col("sid"), col("tid")).as("d2"))
      .distinct()

    // -- verify: row-local banded levenshtein on candidates --------------
    val t1 = base.select(col("id").as("d1"), col("t").as("t1"),
      col("len").as("len1"))
    val t2 = base.select(col("id").as("d2"), col("t").as("t2"),
      col("len").as("len2"))
    val verified = cand.join(t1, "d1").join(t2, "d2")
      .withColumn("dist", levenshtein(col("t1"), col("t2"), k))
      .filter(col("dist") >= 0)

    // -- short×short stratum: every length-windowed pair qualifies -------
    // ed(s,t) ≤ max(|s|,|t|) ≤ k unconditionally, so no pigeonhole is
    // needed — emit with the true distance attached. The non-equi
    // compare runs once per DISTINCT short string pair (bounded by the
    // ≤ k-char string domain; ADVICE r15 — crawl corpora are dense in
    // degenerate shorts, and a row-level compare is quadratic in their
    // MULTIPLICITY), and duplicate mass fans back out through t-keyed
    // equi joins against the (t, id) relation rather than a
    // collect_list array (ADVICE r16: a million-duplicate family as one
    // array row is a single-row executor OOM; as equi-join fan-out the
    // same mass is output rows streaming through an exchange, and the
    // OUTPUT is |pairs|-sized either way — that part is irreducible).
    val sd = shorts.select(col("t"), col("len")).distinct()
    // within-group: identical strings ⇒ dist 0; all unordered id pairs
    // via a t-keyed self equi join (row-streamed, never array-built).
    val within = shorts
      .select(col("t"), col("id").as("d1"), col("len").as("len1"))
      .join(shorts.select(col("t"), col("id").as("d2"),
        col("len").as("len2")), "t")
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("len1"), col("len2"),
        lit(0).as("dist"))
    // cross-group: one verify per distinct string pair, then two
    // id-keyed fan-out joins against the short (t, id) relation.
    val cross = sd.alias("ga")
      .join(sd.alias("gb"), col("ga.t") < col("gb.t") &&
        abs(col("ga.len") - col("gb.len")) <= k)
      .select(col("ga.t").as("ta"), col("gb.t").as("tb"),
        col("ga.len").as("la"), col("gb.len").as("lb"),
        levenshtein(col("ga.t"), col("gb.t")).as("dist"))
      .join(shorts.select(col("t").as("ta"), col("id").as("x")), "ta")
      .join(shorts.select(col("t").as("tb"), col("id").as("y")), "tb")
      .select(least(col("x"), col("y")).as("d1"),
        greatest(col("x"), col("y")).as("d2"),
        when(col("x") < col("y"), col("la")).otherwise(col("lb")).as("len1"),
        when(col("x") < col("y"), col("lb")).otherwise(col("la")).as("len2"),
        col("dist"))

    verified.select(col("d1"), col("d2"), col("len1"), col("len2"), col("dist"))
      .unionByName(within).unionByName(cross)
  }

  /** The reusable index half: (sid, srclen, keyh) segment rows —
    * keyh = xxhash64(srclen, slot, segment bytes), see [[segRelation]] —
    * for every `docs` string longer than k: what [[pairsAgainstIndex]]
    * joins probes against, and what an INCREMENTAL consumer (the
    * streaming dedup sink) accumulates batch over batch instead of
    * rebuilding: the index is append-only under document arrivals.
    */
  def segmentIndex(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"edit-distance threshold must be >= 1, got $k")
    segRelation(prepared(docs).filter(col("len") > k), k)
  }

  /** All (index doc, probe doc) pairs at levenshtein ≤ k, given the
    * index side PRE-SEGMENTED by [[segmentIndex]] (possibly accumulated
    * incrementally). `indexDocs` must be exactly the documents the
    * index was built from — it serves the verify join, the probe
    * length fan-out, and the ≤ k-char short stratum (short index
    * strings have no segments and are length-windowed against the
    * probe side directly). Ids are one namespace across both sides (the
    * `pairs` contract: unique per DOCUMENT), so a document present on
    * both sides is the SAME document and its dist-0 self pair is
    * filtered — overlapping doc sets are safe, not just the disjoint
    * splits the current callers pass.
    *
    * @return (d1 = index id, d2 = probe id, len1, len2, dist).
    */
  def pairsAgainstIndex(index: DataFrame, indexDocs: DataFrame,
                        probeDocs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"edit-distance threshold must be >= 1, got $k")
    val ibase = prepared(indexDocs)
    val pbase = prepared(probeDocs)

    val probes = probeRelation(pbase,
      ibase.filter(col("len") > k)
        .select(col("len").as("srclen")).distinct(), k)
    val cand = index.hint("shuffle_hash").join(probes,
        index("keyh") === probes("keyh") &&
          // self-pair guard: shared id = same document (one namespace)
          col("sid") =!= probes("tid"))
      .select(col("sid").as("d1"), col("tid").as("d2"))
      .distinct()

    val t1 = ibase.select(col("id").as("d1"), col("t").as("t1"),
      col("len").as("len1"))
    val t2 = pbase.select(col("id").as("d2"), col("t").as("t2"),
      col("len").as("len2"))
    val verified = cand.join(t1, "d1").join(t2, "d2")
      .withColumn("dist", levenshtein(col("t1"), col("t2"), k))
      .filter(col("dist") >= 0)

    // index-short × probe (|Δlen| ≤ k ⇒ probe ≤ 2k): direct verify.
    // Quadratic only in the index's OWN short stratum × the probe's
    // ≤ 2k-length window (one relation's degenerate mass, not both);
    // the self-pair guard mirrors the candidate join's.
    val shortPairs = ibase.filter(col("len") <= k).alias("sa")
      .join(pbase.alias("sb"), abs(col("sa.len") - col("sb.len")) <= k &&
        col("sa.id") =!= col("sb.id"))
      .select(col("sa.id").as("d1"), col("sb.id").as("d2"),
        col("sa.t").as("t1"), col("sb.t").as("t2"),
        col("sa.len").as("len1"), col("sb.len").as("len2"))
      .withColumn("dist", levenshtein(col("t1"), col("t2"), k))
      .filter(col("dist") >= 0)

    verified.unionByName(shortPairs)
      .select(col("d1"), col("d2"), col("len1"), col("len2"), col("dist"))
  }

  /** The R-S (cross-relation) form: all (left row, right row) pairs at
    * levenshtein ≤ k — the fuzzy-join a pipeline runs to match scraped
    * titles/URLs against a canonical list. Only the LEFT side indexes
    * (its long strings' segments probe into right strings), which the
    * pigeonhole covers for every pair whose left string is longer than
    * k; left-short pairs are length-windowed against the right side
    * directly (|right| ≤ 2k there — the bounded short stratum).
    *
    * @return (d1 = left id, d2 = right id, len1, len2, dist).
    */
  def pairsAcross(left: DataFrame, right: DataFrame, k: Int): DataFrame =
    pairsAgainstIndex(segmentIndex(left, k), left, right, k)

  /** The quadratic reference form (all pairs, length-windowed, then
    * levenshtein) — the oracle shape, kept for specs to diff against.
    */
  def bruteForcePairs(docs: DataFrame, k: Int): DataFrame = {
    // repartition the STREAM side: the nested-loop join's parallelism is
    // its stream partition count, and a single-file parquet scan would
    // run the whole quadratic single-threaded
    val base = prepared(docs).repartition(32)
    base.alias("a")
      .join(base.alias("b"), col("a.id") < col("b.id") &&
        abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.id").as("d1"), col("b.id").as("d2"),
        col("a.len").as("len1"), col("b.len").as("len2"),
        levenshtein(col("a.t"), col("b.t")).as("dist"))
      .filter(col("dist") <= k)
  }

  /** Cross-relation brute force (spec reference for [[pairsAcross]]). */
  def bruteForceAcross(left: DataFrame, right: DataFrame,
                       k: Int): DataFrame = {
    val lbase = prepared(left).repartition(32)
    val rbase = prepared(right)
    lbase.alias("a")
      .join(rbase.alias("b"), abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.id").as("d1"), col("b.id").as("d2"),
        col("a.len").as("len1"), col("b.len").as("len2"),
        levenshtein(col("a.t"), col("b.t")).as("dist"))
      .filter(col("dist") <= k)
  }
}
