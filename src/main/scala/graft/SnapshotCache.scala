package graft

/** Fingerprint-scoped snapshot-artifact cache — the ONE cache policy for
  * per-corpus-snapshot artifacts (graph edge lists, dedup pair graphs,
  * ANN codebooks, bloom filters, replay directories).
  *
  * The round-6 cache-hygiene work (CacheHygiene) covers per-QUERY
  * persists; this covers the artifacts that legitimately outlive a query:
  * built once per (session, data directory, table content) and reused by
  * every consumer of that snapshot. The round-6 advice spotted the
  * remaining leak in the old flat `TrieMap[fullKey, V]` spelling: the key
  * embedded the table-content FINGERPRINT, so regenerating a testdata
  * directory left the entry for the OLD fingerprint alive in the map for
  * the session lifetime — a localCheckpoint'd DataFrame value stays
  * strongly referenced and its blocks are pinned against the
  * ContextCleaner even though nothing can ever read them again.
  *
  * Here the map is keyed by SCOPE (everything except the fingerprint:
  * app id, directory, structural parameters) and the fingerprint is
  * stored IN the entry: a lookup under the same scope with a NEW
  * fingerprint REPLACES the stale entry, unreferencing the superseded
  * artifact so the ContextCleaner can reclaim its blocks (and bounding
  * the map at one live artifact per scope — scopes themselves are
  * bounded: one per data directory a session touches). Lookup+build is
  * synchronized: artifact builds are rare (once per snapshot) and a
  * duplicate concurrent build of a checkpointed DataFrame would itself
  * leak the loser's blocks.
  */
final class SnapshotCache[V] {
  private val map =
    scala.collection.concurrent.TrieMap.empty[String, (String, V)]

  def getOrElseUpdate(scope: String, fingerprint: String)(build: => V): V =
    synchronized {
      map.get(scope) match {
        case Some((fp, v)) if fp == fingerprint => v
        case _ =>
          val v = build
          map.put(scope, (fingerprint, v))
          v
      }
    }

  /** Visible for tests: the live fingerprint for a scope, if any. */
  private[graft] def liveFingerprint(scope: String): Option[String] =
    map.get(scope).map(_._1)

  private[graft] def size: Int = map.size
}
