package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped prebuilt-index cache for the similarity menu — the
  * amortization seam the `sim_*_idx` queries run through.
  *
  * The build-included `sim_ann`/`sim_ivf`/`sim_pq`/`sim_ivf_pq` queries
  * pay index construction (LSH bucket keys / Lloyd training + cell
  * assignment / codebook training + corpus encode) on EVERY call — the
  * honest one-shot cost, and at 100 TB the dominant one (sim_ivf_pq's
  * 100× profile is almost entirely build). Production doesn't run that
  * shape: an index is built ONCE per corpus snapshot and served to many
  * query batches ([[graft.streaming.StreamOps.annTopKSink]] is the
  * streaming form of exactly this split). This object is the batch form:
  * the first call for a (session, corpus-tag, configuration) key builds,
  * persists (MEMORY_AND_DISK — an index larger than executor memory
  * spills instead of evicting to a rebuild), and MATERIALIZES the index;
  * every later call reuses it, so a steady-state query times only probe +
  * candidate join + rank. The bench's two time-separated sweeps then
  * record both costs: sweep 1 of `sim_*_idx` pays the build, sweep 2 is
  * steady state, and the min — the official per-query number — is the
  * amortized cost, while the build-included sibling keeps reporting the
  * one-shot cost next to it.
  *
  * Keys carry the FULL configuration (tables/planes/seed, nlist/iters,
  * m/ksub), not just the corpus tag — the [[Ann.AnnIndex]] lesson: two
  * configurations share a tag during a sweep, and a silently shared index
  * would join plausibly and return garbage neighbours. The `tag` is the
  * caller's name for the corpus FRAME, not merely its directory: two
  * frames over the same files that differ in preprocessing (raw vs
  * [[Pq.unitNormalized]] embeddings) MUST carry different tags, or the
  * cache hands one of them the other's vectors — cosine cell assignment
  * would even agree (scale-invariant), and only the downstream ADC
  * distances would silently rot (the ScaleOps call sites suffix
  * `#raw`/`#unit` for exactly this reason). Entries are keyed on session
  * IDENTITY so a stopped test session's indexes are never served to its
  * successor; [[clear]] drops and unpersists one session's entries (spec
  * hygiene).
  *
  * NOT a distributed cache: the map lives in the driver JVM, which is
  * where `local[*]` and a cluster driver both run query planning — the
  * persisted frames themselves live on the executors.
  */
object SimIndexes {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), AnyRef]

  /** Build counter (diagnostic): specs assert reuse by watching it stay
    * flat across repeated calls, instead of poking cache internals.
    */
  @volatile private[graft] var builds: Long = 0L

  private def memo[T <: AnyRef](s: SparkSession, key: String)(build: => T): T =
    cache.synchronized {
      // Evict dead sessions' entries on access: keys hold strong session
      // refs, so a stopped test session's plans/persisted frames would
      // otherwise be pinned for the process lifetime (no unpersist — a
      // stopped context's blocks are already gone). The coarse lock also
      // keeps `builds` exact: TrieMap.getOrElseUpdate may run its thunk
      // more than once under concurrent first calls. Builds are rare and
      // expensive; serializing them driver-side costs nothing.
      cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
      cache.getOrElseUpdate((s, key), { builds += 1; build }).asInstanceOf[T]
    }

  private def materialized(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** Prebuilt LSH bucket index over `data` (must carry (vec_id, e)). */
  def ann(data: DataFrame, tag: String, tables: Int = 16,
          planesPerTable: Int = 5, dim: Int = 64, seed: Long = 42L): Ann.AnnIndex =
    memo(data.sparkSession, s"ann|$tag|$tables|$planesPerTable|$dim|$seed") {
      val ix = Ann.dataIndex(data, tables, planesPerTable, dim, seed)
      ix.copy(keys = materialized(ix.keys))
    }

  /** Prebuilt IVF index: (trained centroids, persisted cell assignment). */
  def ivf(data: DataFrame, tag: String, nlist: Int = 8,
          iters: Int = 2): (DataFrame, DataFrame) =
    memo(data.sparkSession, s"ivf|$tag|$nlist|$iters") {
      val cents = Ivf.centroids(data, nlist, iters)
      (cents, materialized(Ivf.assign(data, cents)))
    }

  /** Prebuilt flat-PQ index: (codebooks, persisted encoded corpus).
    * `data` must be unit-normalized ([[Pq.unitNormalized]]) — ADC L2 only
    * ranks like cosine on the unit sphere.
    */
  def pq(data: DataFrame, tag: String, m: Int = 16,
         ksub: Int = 256): (Pq.Codebooks, DataFrame) =
    memo(data.sparkSession, s"pq|$tag|$m|$ksub") {
      val cb = Pq.train(data, m, ksub)
      (cb, materialized(Pq.encode(data, cb)))
    }

  /** Prebuilt IVF-PQ index: (centroids, codebooks, persisted coded cell
    * assignment) — the [[Pq.ivfPqTopK]] `index` triple. Reuses [[ivf]]'s
    * cached assignment when present (same corpus, same nlist/iters): the
    * coded frame is one more projection over it, not a second corpus scan.
    */
  def ivfPq(data: DataFrame, tag: String, nlist: Int = 8, iters: Int = 2,
            m: Int = 16, ksub: Int = 256): (DataFrame, Pq.Codebooks, DataFrame) =
    memo(data.sparkSession, s"ivfpq|$tag|$nlist|$iters|$m|$ksub") {
      val (cents, assigned) = ivf(data, tag, nlist, iters)
      val (cb, _) = pq(data, tag, m, ksub)
      val coded = Pq.encodeAssigned(assigned, cb)
      (cents, cb, materialized(coded))
    }

  /** Drop and unpersist every index this session built (test hygiene —
    * the bench and Verify let session teardown reclaim instead).
    */
  def clear(s: SparkSession): Unit =
    cache.keys.filter(_._1 eq s).foreach { k =>
      cache.remove(k).foreach {
        case ix: Ann.AnnIndex => ix.keys.unpersist()
        case (_, df: DataFrame) => df.unpersist()
        case (_, _, df: DataFrame) => df.unpersist()
        case _ => ()
      }
    }
}
