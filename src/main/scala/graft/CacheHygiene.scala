package graft

import org.apache.spark.sql.DataFrame

/** Deterministic release of per-query caches (round-5 advice item).
  *
  * Operators that persist an internal relation consumed only within
  * their own plan cannot `unpersist` before the caller executes — the
  * returned lazy plan still reads the cache. But leaving the entries
  * behind is worse at scale: `Dataset.persist` registers in the
  * CacheManager, which holds the cached plan until EXPLICIT unpersist
  * (never GC), and every invocation registers a NEW entry (the bench's
  * min-of-3 protocol tripled each graph query's edge cache; a
  * long-lived session accumulates stale MEMORY_AND_DISK blocks that
  * evict genuinely hot data).
  *
  * The resolution: operators whose RESULT is small and bounded (graph
  * rollups, audit matrices, per-source tables — O(nodes) at worst,
  * distributed executor blocks, never driver memory) eagerly
  * materialize it with `localCheckpoint` and then release their
  * caches. The checkpoint's blocks ARE reclaimed by the
  * ContextCleaner once the plan is unreferenced, unlike CacheManager
  * entries, so the session's steady state is clean. Plan-shape specs
  * audit the INTERNAL builder (the plan that actually executes under
  * the checkpoint), not the checkpoint scan.
  */
object CacheHygiene {
  def materializeAndRelease(result: DataFrame,
      caches: Seq[DataFrame]): DataFrame = {
    try {
      val out = result.localCheckpoint() // eager: runs the plan NOW
      out
    } finally caches.foreach(_.unpersist(false))
  }
}
