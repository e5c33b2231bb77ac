package graft

import org.scalatest.funsuite.AnyFunSuite

/** SnapshotCache semantics (round-6 advice): per-scope single-slot
  * caching with eviction on fingerprint change — a regenerated data
  * directory must REPLACE the stale artifact, not accumulate beside it. */
class SnapshotCacheSpec extends AnyFunSuite {

  test("same fingerprint hits; new fingerprint rebuilds and evicts") {
    val cache = new SnapshotCache[String]
    var builds = 0
    def build(v: String): String = { builds += 1; v }
    assert(cache.getOrElseUpdate("scope", "fp1")(build("a")) == "a")
    assert(cache.getOrElseUpdate("scope", "fp1")(build("b")) == "a")
    assert(builds == 1, "same fingerprint must be served from cache")
    // regenerated data → new fingerprint → rebuild, stale value evicted
    assert(cache.getOrElseUpdate("scope", "fp2")(build("c")) == "c")
    assert(builds == 2)
    assert(cache.liveFingerprint("scope").contains("fp2"))
    assert(cache.size == 1, "one live artifact per scope, never two")
    // going BACK to fp1 rebuilds too (single-slot by design: the stale
    // artifact was unreferenced, not archived)
    assert(cache.getOrElseUpdate("scope", "fp1")(build("d")) == "d")
    assert(builds == 3)
  }

  test("scopes are independent") {
    val cache = new SnapshotCache[Int]
    assert(cache.getOrElseUpdate("s1", "fp")(1) == 1)
    assert(cache.getOrElseUpdate("s2", "fp")(2) == 2)
    assert(cache.size == 2)
    assert(cache.getOrElseUpdate("s1", "fp")(99) == 1)
  }
}
