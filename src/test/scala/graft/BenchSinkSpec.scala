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
}
