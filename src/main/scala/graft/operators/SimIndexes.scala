package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
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

  /** Per-entry mutation counter (the [[Graphs]] revs rule): 1 at build,
    * bumped by [[annAppend]]/[[ivfAppend]], restored from the manifest
    * on load — (key, rev) identifies an entry's CONTENT so [[saveAll]]
    * can skip committed-current entries. Lives and dies with the cache
    * entry under the same lock.
    */
  private val revs =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Long]

  private def revOf(s: SparkSession, key: String): Long =
    revs.getOrElse((s, key), 1L)

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
      evictDead()
      cache.getOrElseUpdate((s, key),
        { builds += 1; revs.put((s, key), 1L); build }).asInstanceOf[T]
    }

  private def evictDead(): Unit = {
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    revs.keys.filter(_._1.sparkContext.isStopped).foreach(revs.remove)
  }

  /** The memo → ARTIFACT → build probe (the [[Graphs.index]] rule,
    * sim-family side): on a memo miss with an `artifact` base, a
    * committed entry under exactly (key, kind) installs off disk with
    * builds flat; a clean miss builds and [[writeEntry]]s the result
    * back so the next driver loads. `reload` reconstructs the typed
    * entry from its artifact dir.
    */
  private def serveOrBuild[T <: AnyRef](s: SparkSession, key: String,
                                        kind: String, artifact: Option[String])
                                       (reload: (String, String) => T)
                                       (build: => T): T =
    cache.synchronized { evictDead(); cache.get((s, key)) } match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        artifact.flatMap { base =>
          Artifacts.lookup(s, base, key).collect {
            case (d, k, params, rev) if k == kind =>
              cache.synchronized {
                evictDead()
                cache.getOrElseUpdate((s, key),
                  { revs.put((s, key), rev); reload(d, params) }).asInstanceOf[T]
              }
          }
        }.getOrElse {
          val v = memo(s, key)(build)
          artifact.foreach(base => writeEntry(s, base, key, v))
          v
        }
    }

  private def materialized(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** Prebuilt LSH bucket index over `data` (must carry (vec_id, e)).
    * `artifact` follows the [[Graphs.index]] memo → artifact → build
    * rule; the recorded plane parameters re-validate on load (the
    * typed-carrier rule).
    */
  def ann(data: DataFrame, tag: String, tables: Int = 16,
          planesPerTable: Int = 5, dim: Int = 64, seed: Long = 42L,
          artifact: Option[String] = None): Ann.AnnIndex =
    serveOrBuild[Ann.AnnIndex](data.sparkSession,
      s"ann|$tag|$tables|$planesPerTable|$dim|$seed", "ann", artifact)(
      (d, params) => {
        val Array(t, ppt, dm, sd, maxB) = params.split('|')
        Ann.AnnIndex(materialized(Artifacts.frame(data.sparkSession, d, "keys")),
          t.toInt, ppt.toInt, dm.toInt, sd.toLong, maxB.toInt)
      }) {
      val ix = Ann.dataIndex(data, tables, planesPerTable, dim, seed)
      ix.copy(keys = materialized(ix.keys))
    }

  /** Prebuilt IVF index: (trained centroids, persisted cell
    * assignment). `artifact`: the [[Graphs.index]] rule.
    */
  def ivf(data: DataFrame, tag: String, nlist: Int = 8, iters: Int = 2,
          artifact: Option[String] = None): (DataFrame, DataFrame) =
    serveOrBuild[(DataFrame, DataFrame)](data.sparkSession,
      s"ivf|$tag|$nlist|$iters", "ivf", artifact)(
      (d, _) => (
        materialized(Artifacts.frame(data.sparkSession, d, "cents")),
        materialized(Artifacts.frame(data.sparkSession, d, "assigned")))) {
      val cents = Ivf.centroids(data, nlist, iters)
      (cents, materialized(Ivf.assign(data, cents)))
    }

  /** Prebuilt flat-PQ index: (codebooks, persisted encoded corpus).
    * `data` must be unit-normalized ([[Pq.unitNormalized]]) — ADC L2 only
    * ranks like cosine on the unit sphere. `artifact`: the
    * [[Graphs.index]] rule.
    */
  def pq(data: DataFrame, tag: String, m: Int = 16, ksub: Int = 256,
         artifact: Option[String] = None): (Pq.Codebooks, DataFrame) =
    serveOrBuild[(Pq.Codebooks, DataFrame)](data.sparkSession,
      s"pq|$tag|$m|$ksub", "pq", artifact)(
      (d, _) => (
        codebooksOf(Artifacts.frame(data.sparkSession, d, "codebooks")),
        materialized(Artifacts.frame(data.sparkSession, d, "encoded")))) {
      val cb = Pq.train(data, m, ksub)
      (cb, materialized(Pq.encode(data, cb)))
    }

  /** Prebuilt IVF-PQ index: (centroids, codebooks, persisted coded cell
    * assignment) — the [[Pq.ivfPqTopK]] `index` triple. Reuses [[ivf]]'s
    * cached assignment when present (same corpus, same nlist/iters): the
    * coded frame is one more projection over it, not a second corpus scan.
    * `artifact` threads through to the nested [[ivf]]/[[pq]] builds.
    */
  def ivfPq(data: DataFrame, tag: String, nlist: Int = 8, iters: Int = 2,
            m: Int = 16, ksub: Int = 256,
            artifact: Option[String] = None): (DataFrame, Pq.Codebooks, DataFrame) =
    serveOrBuild[(DataFrame, Pq.Codebooks, DataFrame)](data.sparkSession,
      s"ivfpq|$tag|$nlist|$iters|$m|$ksub", "ivfpq", artifact)(
      (d, _) => (
        materialized(Artifacts.frame(data.sparkSession, d, "cents")),
        codebooksOf(Artifacts.frame(data.sparkSession, d, "codebooks")),
        materialized(Artifacts.frame(data.sparkSession, d, "coded")))) {
      val (cents, assigned) = ivf(data, tag, nlist, iters, artifact)
      val (cb, _) = pq(data, tag, m, ksub, artifact)
      val coded = Pq.encodeAssigned(assigned, cb)
      (cents, cb, materialized(coded))
    }

  /** Persisted frames embedded in LAZY layers after [[annAppend]] /
    * [[ivfAppend]] (the [[Graphs.GraphIndex]] pieces rule, carried in a
    * side map because the sim entries are plain tuples): [[clear]]
    * releases them with the entry.
    */
  private val pieces =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[DataFrame]]

  private def addPieces(s: SparkSession, key: String,
                        ps: Seq[DataFrame]): Unit = {
    val k = (s, key)
    pieces.put(k, pieces.getOrElse(k, Nil) ++ ps)
    ()
  }

  /** Append newly-arrived vectors to the cached LSH index WITHOUT a
    * rebuild ([[Graphs.applyDelta]]'s sim-family twin): hash the delta
    * with the SAME recorded planes (tag + full configuration — the
    * typed-carrier rule means appended keys are geometrically
    * compatible by construction) and layer them onto the keys frame as
    * a lazy union. Vectors whose `vec_id` is already indexed are
    * skipped (append is idempotent under re-delivery). Work is
    * delta-proportional: plane hashing is row-local over the delta,
    * plus one cached-keys scan for the dedup anti-join (delta side
    * broadcasts). Refuses a bucket-capped index: appending can push a
    * bucket over `maxBucketSize`, and re-capping is a rebuild-shaped
    * decision the caller must make explicitly.
    */
  def annAppend(delta: DataFrame, tag: String, tables: Int = 16,
                planesPerTable: Int = 5, dim: Int = 64,
                seed: Long = 42L): Ann.AnnIndex = {
    val s = delta.sparkSession
    val key = s"ann|$tag|$tables|$planesPerTable|$dim|$seed"
    val old = cache.synchronized(cache.get((s, key))) match {
      case Some(ix: Ann.AnnIndex) => ix
      case _ => throw new IllegalStateException(
        s"annAppend: no cached ann index for '$key' — build or load first")
    }
    require(old.maxBucketSize == Int.MaxValue,
      "annAppend: appending to a bucket-capped index can overflow its " +
        "cap — rebuild (or re-cap) explicitly instead")
    val fresh = delta.join(old.keys.select(col("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")
    val newKeys = materialized(
      Ann.bucketKeys(fresh, tables, planesPerTable, dim, seed)
        .select(col("vec_id"), col("e"), col("table"), col("bucket")))
    val next = old.copy(keys = old.keys.unionAll(newKeys))
    cache.synchronized {
      cache.put((s, key), next)
      revs.put((s, key), revOf(s, key) + 1)
      ()
    }
    addPieces(s, key, Seq(old.keys, newKeys))
    next
  }

  /** Append newly-arrived vectors to the cached IVF index against
    * FROZEN centroids — standard IVF practice (retraining is a rebuild
    * decision made on drift evidence, not per arrival; the assignment
    * is exact for the centroids as they stand, and the spec pins
    * append ≡ `Ivf.assign` over the union with the SAME centroids).
    * Already-assigned `vec_id`s are skipped (idempotent re-delivery).
    */
  def ivfAppend(delta: DataFrame, tag: String, nlist: Int = 8,
                iters: Int = 2): (DataFrame, DataFrame) = {
    val s = delta.sparkSession
    val key = s"ivf|$tag|$nlist|$iters"
    val old = cache.synchronized(cache.get((s, key))) match {
      case Some((cents: DataFrame, assigned: DataFrame)) => (cents, assigned)
      case _ => throw new IllegalStateException(
        s"ivfAppend: no cached ivf index for '$key' — build or load first")
    }
    val (cents, assigned) = old
    val fresh = delta.join(assigned.select(col("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")
    val newAssigned = materialized(Ivf.assign(fresh, cents))
    val next = (cents, assigned.unionAll(newAssigned))
    cache.synchronized {
      cache.put((s, key), next)
      revs.put((s, key), revOf(s, key) + 1)
      ()
    }
    addPieces(s, key, Seq(assigned, newAssigned))
    next
  }

  /** Remove vectors from the cached LSH index ([[annAppend]]'s
    * retraction twin — round-17 verdict #3): tombstone the given
    * `vec_id`s by filtering the keys frame as a lazy broadcast
    * anti-join layer, so every later probe simply never sees them.
    * Exactly a rebuild minus the removed vectors, because LSH keys are
    * row-local (each key row depends only on its own vector and the
    * frozen planes — dropping rows IS dropping vectors). Removing an
    * unindexed id is a no-op; work is one cached-keys scan per serve
    * with the tombstone set broadcast. `ids` must carry `vec_id`.
    */
  def annRemove(ids: DataFrame, tag: String, tables: Int = 16,
                planesPerTable: Int = 5, dim: Int = 64,
                seed: Long = 42L): Ann.AnnIndex = {
    val s = ids.sparkSession
    val key = s"ann|$tag|$tables|$planesPerTable|$dim|$seed"
    val old = cache.synchronized(cache.get((s, key))) match {
      case Some(ix: Ann.AnnIndex) => ix
      case _ => throw new IllegalStateException(
        s"annRemove: no cached ann index for '$key' — build or load first")
    }
    val gone = materialized(ids.select(col("vec_id")).distinct())
    val next = old.copy(keys =
      old.keys.join(broadcast(gone), Seq("vec_id"), "left_anti"))
    cache.synchronized {
      cache.put((s, key), next)
      revs.put((s, key), revOf(s, key) + 1)
      ()
    }
    addPieces(s, key, Seq(old.keys, gone))
    next
  }

  /** [[annRemove]]'s IVF twin: tombstone vectors out of the cached cell
    * assignment (assignment rows are row-local against the frozen
    * centroids, the [[ivfAppend]] argument reversed). Centroids stay
    * frozen — retraining on shrink is the same drift-evidence rebuild
    * decision as on growth.
    */
  def ivfRemove(ids: DataFrame, tag: String, nlist: Int = 8,
                iters: Int = 2): (DataFrame, DataFrame) = {
    val s = ids.sparkSession
    val key = s"ivf|$tag|$nlist|$iters"
    val old = cache.synchronized(cache.get((s, key))) match {
      case Some((cents: DataFrame, assigned: DataFrame)) => (cents, assigned)
      case _ => throw new IllegalStateException(
        s"ivfRemove: no cached ivf index for '$key' — build or load first")
    }
    val (cents, assigned) = old
    val gone = materialized(ids.select(col("vec_id")).distinct())
    val next = (cents,
      assigned.join(broadcast(gone), Seq("vec_id"), "left_anti"))
    cache.synchronized {
      cache.put((s, key), next)
      revs.put((s, key), revOf(s, key) + 1)
      ()
    }
    addPieces(s, key, Seq(assigned, gone))
    next
  }

  /** Persist every index this session built as a parquet artifact under
    * `base` ([[Artifacts]] layout; round-16 verdict #1). The manifest
    * records the FULL cache key — tag AND configuration — so a loaded
    * artifact can only serve the exact (corpus frame, geometry) it was
    * built for; the ann entry additionally records its plane parameters
    * so the reconstructed [[Ann.AnnIndex]] re-validates against query-
    * side hashing (the typed-carrier rule). Codebooks round-trip
    * through a (subspace, code, vec) frame — m×ksub rows, tiny.
    */
  def saveAll(s: SparkSession, base: String): Int = {
    val entries = cache.synchronized(cache.toSeq.filter(_._1._1 eq s))
    entries.count { case ((_, key), v) => writeEntry(s, base, key, v) }
  }

  /** Write one cache entry as an artifact — UNLESS the target dir
    * already holds a committed manifest with the same (key, rev) (the
    * [[Graphs]] skip-unchanged rule: a second saveAll to the same base
    * leaves file mtimes untouched). Returns true when the entry is an
    * artifact kind (written or already current).
    */
  private def writeEntry(s: SparkSession, base: String, key: String,
                         v: AnyRef): Boolean = {
    val d = s"$base/${Artifacts.slug(key)}"
    val rev = revOf(s, key)
    val current = Artifacts.manifest(s, d)
      .exists { case (k, _, _, r) => k == key && r == rev }
    v match {
      case ix: Ann.AnnIndex =>
        if (!current)
          Artifacts.write(s, d, key, "ann",
            s"${ix.tables}|${ix.planesPerTable}|${ix.dim}|${ix.seed}|${ix.maxBucketSize}",
            Seq("keys" -> ix.keys), rev)
        true
      case (cents: DataFrame, assigned: DataFrame) =>
        if (!current)
          Artifacts.write(s, d, key, "ivf", "",
            Seq("cents" -> cents, "assigned" -> assigned), rev)
        true
      case (cb: Array[_], encoded: DataFrame) =>
        if (!current)
          Artifacts.write(s, d, key, "pq", "",
            Seq("codebooks" -> codebooksDF(s, cb.asInstanceOf[Pq.Codebooks]),
              "encoded" -> encoded), rev)
        true
      case (cents: DataFrame, cb: Array[_], coded: DataFrame) =>
        if (!current)
          Artifacts.write(s, d, key, "ivfpq", "",
            Seq("cents" -> cents,
              "codebooks" -> codebooksDF(s, cb.asInstanceOf[Pq.Codebooks]),
              "coded" -> coded), rev)
        true
      case _ => false
    }
  }

  /** Install every committed index artifact under `base` into session
    * `s`'s cache WITHOUT counting builds — the cold-start path (the
    * [[Graphs.loadAll]] twin): a fresh driver serves every `sim_*_idx`
    * query from the loaded artifact, paying a parquet scan + persist
    * instead of plane hashing / Lloyd training / codebook training.
    * Entries the session already holds are left untouched.
    */
  def loadAll(s: SparkSession, base: String): Int =
    Artifacts.entries(s, base).count { case (d, key, kind, params, rev) =>
      kind match {
        case "ann" =>
          val Array(tables, ppt, dim, seed, maxB) = params.split('|')
          installLoaded(s, key, rev)(Ann.AnnIndex(
            materialized(Artifacts.frame(s, d, "keys")),
            tables.toInt, ppt.toInt, dim.toInt, seed.toLong, maxB.toInt))
          true
        case "ivf" =>
          installLoaded(s, key, rev)((
            materialized(Artifacts.frame(s, d, "cents")),
            materialized(Artifacts.frame(s, d, "assigned"))))
          true
        case "pq" =>
          installLoaded(s, key, rev)((
            codebooksOf(Artifacts.frame(s, d, "codebooks")),
            materialized(Artifacts.frame(s, d, "encoded"))))
          true
        case "ivfpq" =>
          installLoaded(s, key, rev)((
            materialized(Artifacts.frame(s, d, "cents")),
            codebooksOf(Artifacts.frame(s, d, "codebooks")),
            materialized(Artifacts.frame(s, d, "coded"))))
          true
        case _ => false
      }
    }

  /** [[memo]] minus the build counter (the [[Graphs.loadAll]] rule);
    * the manifest's rev installs with the entry.
    */
  private def installLoaded[T <: AnyRef](s: SparkSession, key: String,
                                         rev: Long)(mk: => T): T =
    cache.synchronized {
      evictDead()
      cache.getOrElseUpdate((s, key), { revs.put((s, key), rev); mk })
        .asInstanceOf[T]
    }

  private def codebooksDF(s: SparkSession, cb: Pq.Codebooks): DataFrame = {
    import s.implicits._
    cb.zipWithIndex.flatMap { case (codes, j) =>
      codes.zipWithIndex.map { case (v, c) => (j, c, v.toSeq) }
    }.toSeq.toDF("j", "code", "vec")
  }

  private def codebooksOf(df: DataFrame): Pq.Codebooks = {
    val rows = df.select("j", "code", "vec").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    Array.tabulate(rows.map(_._1).max + 1) { j =>
      rows.filter(_._1 == j).sortBy(_._2).map(_._3)
    }
  }

  /** Drop and unpersist every index this session built (test hygiene —
    * the bench and Verify let session teardown reclaim instead).
    * Same single-writer contract as [[Graphs.clear]].
    */
  def clear(s: SparkSession): Unit = cache.synchronized {
    revs.keys.filter(_._1 eq s).foreach(revs.remove)
    cache.keys.filter(_._1 eq s).foreach { k =>
      cache.remove(k).foreach {
        case ix: Ann.AnnIndex => ix.keys.unpersist()
        case (_, df: DataFrame) => df.unpersist()
        case (_, _, df: DataFrame) => df.unpersist()
        case _ => ()
      }
    }
    pieces.keys.filter(_._1 eq s).foreach { k =>
      pieces.remove(k).foreach(_.foreach(_.unpersist()))
    }
  }
}
