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
  * of t; and because the net insert/delete balance before that segment
  * is bounded by the total edits, its start position in t differs from
  * its start in s by at most k. Candidates are therefore: (segment of
  * an indexed string) equi-matched against (substrings of a probed
  * string at the ±k position window), then VERIFIED with the true
  * levenshtein — verification only ever sees blocked candidates.
  *
  * Scale shape (the 100 TB lens): both sides are map-side expansions —
  * k+1 segment rows per indexed string, O(k²·(2k+1)) windowed probe
  * substrings per probed string (a per-row CONSTANT; ~2.6 k rows at
  * k = 8) — meeting in ONE equi hash join on (source length, slot,
  * segment bytes), then a distinct on the candidate pair ids and a
  * row-local verify. No sort, no cartesian, no driver collect; the
  * plan is gated (PlanSpec). Skew: a boilerplate segment shared by a
  * hot template family concentrates its (len, slot, seg) key exactly
  * like the substring-dedup gram buckets — those keys are real
  * candidate mass (every doc in the family IS a near-match of the
  * others), so unlike the screening operators there is no correct
  * whole-bucket drop; a 100 TB run faced with a pathological family
  * should exact-dedup identical prefixes first (the phash rule:
  * duplicate mass belongs in a hash-groupBy, not a candidate join),
  * which [[graft.queries.LlmOps]]'s dedup_exact stage provides.
  *
  * Short strings (len ≤ k) get the pigeonhole from the OTHER side or
  * no pigeonhole at all, and are handled exactly rather than excluded:
  * a pair with both sides ≤ k always satisfies ed ≤ max(len) ≤ k, so
  * the short×short stratum is emitted wholesale (quadratic in the
  * stratum — degenerate ≤ 8-char strings are a vanishing mass in any
  * real corpus, and the emit is still length-windowed); a long×short
  * pair is caught by the long side's segments probed in the short
  * string (the probe generator's source-length window [len−k, len+k]
  * covers the longer source).
  */
object EditDistJoin {
  /** All unordered pairs of `docs` rows with levenshtein(t) ≤ k.
    *
    * @param docs (id: integral, t: string) — one row per string; ids
    *             unique (pairs are reported as d1 < d2 by id).
    * @return (d1, d2, len1, len2, dist) ordered nowhere — callers sort.
    */
  def pairs(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"edit-distance threshold must be >= 1, got $k")
    val base = docs.select(col("id"), col("t"), length(col("t")).as("len"))
    val longs = base.filter(col("len") > k)
    val shorts = base.filter(col("len") <= k)

    // -- index side: k+1 even segments per long string -------------------
    // segment i of an L-char string spans 1-based positions
    // [floor(iL/(k+1))+1, floor((i+1)L/(k+1))] — the deterministic even
    // partition both the probe generator and the oracle-side reasoning
    // share. L > k guarantees every segment is non-empty.
    val segs = longs.select(
      col("id").as("sid"), col("len").as("srclen"),
      explode(transform(sequence(lit(0), lit(k)), i => {
        val st = (floor(i * col("len") / (k + 1)) + 1).cast("int")
        val en = floor((i + 1) * col("len") / (k + 1)).cast("int")
        struct(i.cast("int").as("slot"),
          col("t").substr(st, en - st + 1).as("seg"))
      })).as("sg"))
      .select(col("sid"), col("srclen"), col("sg.slot").as("slot"),
        col("sg.seg").as("seg"))

    // -- probe side: windowed substrings per string ----------------------
    // For every plausible source length ℓ ∈ [len−k, len+k] (ed ≥ length
    // difference) and every slot i, the substrings of THIS string with
    // segment i's length at start positions within ±k of segment i's
    // home position. Triple array comprehension, flattened then
    // exploded — entirely map-side.
    // Probe generation is three chained CODEGEN stages, not one nested
    // higher-order lambda (the first cut's interpreted triple-transform
    // dominated the sf0.1 bench): (1) fan out each string to the source
    // lengths that actually EXIST in the corpus (broadcast of the
    // distinct-length relation — bounded by the length domain, which an
    // edit-distance contract caps by construction; only real lengths
    // generate probes, where a blind [len−k, len+k] loop pays for
    // lengths nobody has), (2) explode the k+1 slots and compute each
    // slot's segment geometry ONCE as plain projections, (3) explode
    // the position window and cut the substring. The position window is
    // the TIGHT one: a preserved segment's shift δ and the total length
    // difference Δ = |t| − ℓ satisfy |δ| + |Δ − δ| ≤ k (edits before
    // the segment account for the net shift, edits after it for the
    // remaining length change, and the two edit sets are disjoint), so
    // δ ∈ [−⌈(k−Δ)/2⌉, ⌊(k+Δ)/2⌋] — ~k+1 positions per slot instead of
    // the naive ±k's 2k+1.
    val kp1 = k + 1
    val lens = longs.select(col("len").as("srclen")).distinct()
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
    val probes = slotted
      .select(col("tid"), col("plen"), col("srclen"), col("slot"),
        col("t"), col("slen"),
        explode(sequence(col("lo"), col("hi"))).as("p"))
      .select(col("tid"), col("plen"), col("srclen"), col("slot"),
        col("t").substr(col("p"), col("slen")).as("sub"))

    // -- block: one equi hash join on (source length, slot, bytes) -------
    // Long probes only need the sid < tid direction (for a long-long
    // pair the pigeonhole holds from BOTH sides, so the lower-id-indexes
    // orientation finds it exactly once per matching key); short probes
    // keep both (only the long side can index).
    // SHUFFLE_HASH: the exploded probe relation's size is invisible to
    // the planner (Generate breaks stats), and a mis-chosen broadcast of
    // the LARGE side builds a driver-resident hashed relation of the
    // whole probe expansion (measured: the sf0.1 bench spent its time
    // exactly there). The segment side is the provably smaller build.
    val cand = segs.hint("shuffle_hash").join(probes,
        segs("srclen") === probes("srclen") && segs("slot") === probes("slot") &&
          segs("seg") === probes("sub") &&
          (probes("plen") <= k || segs("sid") < probes("tid")) &&
          segs("sid") =!= probes("tid"))
      .select(least(col("sid"), col("tid")).as("d1"),
        greatest(col("sid"), col("tid")).as("d2"))
      .distinct()

    // -- verify: row-local banded levenshtein on candidates --------------
    // The 3-arg threshold form runs the O(k·n) banded DP and returns -1
    // past the threshold — at k = 8 over 120-char prefixes that is ~7×
    // cheaper than the full O(n·m) matrix, and the verify stage is where
    // a low-entropy corpus (colliding segments → candidate mass) spends
    // its time (measured: 54.9 → 9.6 s at sf0.1).
    val t1 = base.select(col("id").as("d1"), col("t").as("t1"),
      col("len").as("len1"))
    val t2 = base.select(col("id").as("d2"), col("t").as("t2"),
      col("len").as("len2"))
    val verified = cand.join(t1, "d1").join(t2, "d2")
      .withColumn("dist", levenshtein(col("t1"), col("t2"), k))
      .filter(col("dist") >= 0)

    // -- short×short stratum: every length-windowed pair qualifies -------
    // ed(s,t) ≤ max(|s|,|t|) ≤ k unconditionally, so no pigeonhole is
    // needed — emit with the true distance attached.
    val shortPairs = shorts.alias("sa")
      .join(shorts.alias("sb"), col("sa.id") < col("sb.id") &&
        abs(col("sa.len") - col("sb.len")) <= k)
      .select(col("sa.id").as("d1"), col("sb.id").as("d2"),
        col("sa.t").as("t1"), col("sb.t").as("t2"),
        col("sa.len").as("len1"), col("sb.len").as("len2"))
      .withColumn("dist", levenshtein(col("t1"), col("t2")))

    verified.unionByName(shortPairs)
      .select(col("d1"), col("d2"), col("len1"), col("len2"), col("dist"))
  }

  /** The quadratic reference form (all pairs, length-windowed, then
    * levenshtein) — the oracle shape, kept for specs to diff against.
    */
  def bruteForcePairs(docs: DataFrame, k: Int): DataFrame = {
    val base = docs.select(col("id"), col("t"), length(col("t")).as("len"))
    base.alias("a")
      .join(base.alias("b"), col("a.id") < col("b.id") &&
        abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.id").as("d1"), col("b.id").as("d2"),
        col("a.len").as("len1"), col("b.len").as("len2"),
        levenshtein(col("a.t"), col("b.t")).as("dist"))
      .filter(col("dist") <= k)
  }
}
