package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounds intra-query `persist()`/`cache()` residency to ONE
  * generation per call site per JVM — the minhash-signature eviction
  * discipline (round 15), generalized to every operator that caches an
  * intermediate (r17 verdict item 5: the operators never unpersist
  * their model-frame caches; harmless under Bench/Verify, which clear
  * the cache between samples/queries, but a long-lived session
  * invoking an operator repeatedly accumulated dead InMemoryRelations
  * until LRU eviction).
  *
  * Each invocation registers ALL the frames it cached under its call
  * site's key; the previous invocation's frames are unpersisted —
  * recompute-safe even if a still-unmaterialized plan references the
  * evicted cache (it recomputes from source), and best-effort (the
  * previous frames may belong to an already-stopped session whose
  * cache manager throws rather than no-ops).
  *
  * A previous frame whose canonical plan matches a CURRENT frame is
  * left alone: `persist()` on an equal plan reuses the existing cache
  * entry, so unpersisting the "old" Dataset would evict the entry the
  * new invocation just registered and silently defeat the intra-query
  * reuse the cache exists for.
  */
object CacheTracker {
  private val last =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFrame]]()

  def track(key: String, dfs: DataFrame*): Unit = {
    val cur = dfs.toSeq
    val prev = last.put(key, cur)
    if (prev != null) prev.foreach { p =>
      val sharedEntry =
        try
          cur.exists(d =>
            d.queryExecution.analyzed.sameResult(p.queryExecution.analyzed))
        catch { case _: Throwable => false }
      if (!sharedEntry)
        try p.unpersist(blocking = false)
        catch { case _: Throwable => () }
    }
  }
}
