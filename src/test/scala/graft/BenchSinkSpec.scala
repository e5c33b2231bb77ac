package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the bench-record write routing (round-11 verdict item 1): the
  * canonical BENCH_SUMMARY.json is the frozen-protocol yardstick and
  * must be impossible to clobber from a targeted iteration run (the
  * round-8 scar) OR a hot ad-hoc/driver full-suite run (the round-10
  * scar — the 156.2 s validation-F record was overwritten by the
  * driver's 15%-steal session). Only quiet_bench.sh, which arms the
  * vmstat trace and sets SPARK_GRAFT_BENCH_PROTOCOL=quiet, may refresh
  * it; every run still refreshes BENCH_LAST.json so the latest reading
  * is always readable. */
class BenchSinkSpec extends AnyFunSuite {

  test("full-suite quiet-protocol run refreshes BOTH sidecars") {
    assert(Bench.summarySinks(targeted = false, Some("quiet")) ==
      Seq("BENCH_LAST.json", "BENCH_SUMMARY.json"))
  }

  test("full-suite ad-hoc (driver/hot) run cannot touch BENCH_SUMMARY.json") {
    assert(Bench.summarySinks(targeted = false, None) == Seq("BENCH_LAST.json"))
    assert(Bench.summarySinks(targeted = false, Some("ad-hoc")) ==
      Seq("BENCH_LAST.json"))
    assert(Bench.summarySinks(targeted = false, Some("")) ==
      Seq("BENCH_LAST.json"))
  }

  test("targeted run cannot touch BENCH_SUMMARY.json even under the quiet protocol") {
    // quiet_bench.sh supports SPARK_GRAFT_BENCH_ONLY probes (the t16/t17
    // drift protocol) — those are valid quiet runs but not full-suite
    // records, so they must stay out of the canonical file too.
    assert(Bench.summarySinks(targeted = true, Some("quiet")) ==
      Seq("BENCH_LAST.json"))
    assert(Bench.summarySinks(targeted = true, None) == Seq("BENCH_LAST.json"))
  }

  test("durable dump routing (r12 task 2b): full-suite runs write a " +
    "timestamped plans/ record, targeted runs and non-repo cwds never do") {
    val plans = java.nio.file.Files.createTempDirectory("graft_plans").toFile
    try {
      assert(Bench.durableDumpPath(targeted = false, plans, 1700000000L)
        .map(_.getFileName.toString).contains("bench_1700000000.json"))
      assert(Bench.durableDumpPath(targeted = true, plans, 1700000000L).isEmpty,
        "a targeted probe must not litter the archival plans/ dir")
      val missing = new java.io.File(plans, "nope")
      assert(Bench.durableDumpPath(targeted = false, missing, 1L).isEmpty,
        "no plans/ dir (bench outside a checkout) must not create one")
    } finally plans.delete()
  }

  test("steal self-attribution fragment (r12 task 2a): keys, rounding, " +
    "the 5% hot threshold, and the no-reading case") {
    assert(Bench.stealSummary(Nil) == "",
      "unreadable /proc/stat must not emit empty-looking zeros")
    assert(Bench.stealSummary(Seq(1.0, 2.0, 18.884)) ==
      ""","steal_mean":7.29,"steal_max":18.88,"hot_runs":1""")
    // exactly-5% counts as hot (matches drift_join.py's >= threshold)
    assert(Bench.stealSummary(Seq(5.0, 4.99)).endsWith(""""hot_runs":1"""))
  }

  test("bandwidth-canary fragment (r13): min/median/max keys, and the " +
    "kernel itself does constant work in bounded time") {
    assert(Bench.canarySummary(Nil) == "")
    assert(Bench.canarySummary(Seq(12.34, 8.15, 40.0)) ==
      ""","canary_min":8.2,"canary_med":12.3,"canary_max":40.0""")
    val ms = (1 to 3).map(_ => Bench.canaryMs())
    assert(ms.forall(m => m > 0 && m < 2000),
      s"canary kernel out of its sane band: $ms")
  }
}
