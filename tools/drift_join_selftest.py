#!/usr/bin/env python3
"""Smoke test for the drift-attribution join (round-11 verdict item 4):
synthesizes a Bench timeline and a vmstat -t trace containing ONE hot
steal window, and asserts that drift_join (a) attributes the hot window
to exactly the run that executed inside it, (b) counts it in
--stats-json, (c) reports zero-overlap runs loudly instead of silently
skipping them, (d) still parses the 5-column pre-round-11 timeline
format, (e) distinguishes failed (ok=false) runs, and (f — round 12)
catches SUB-WINDOW steal: a run whose 2 s vmstat windows all read zero
but whose own /proc/stat column (Bench's per-run steal delta) reads hot
must be counted hot — the round-11 run-B blindness class.

Run: python3 tools/drift_join_selftest.py   (exit 0 = gate works)
"""
import os
import subprocess
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(__file__))
import drift_join  # noqa: E402

BASE = 1_700_000_000  # synthetic session start (epoch seconds)


def wall(epoch):
    # vmstat -t prints LOCAL wall time; emit what the host zone would show
    # so parse_vmstat's default --tz local round-trips exactly.
    return datetime.fromtimestamp(epoch).strftime("%Y-%m-%d %H:%M:%S")


def vmstat_line(epoch, steal):
    # 17 counter columns (procs..st) + date + time = 19 fields, like
    # procps vmstat -t; only si/so (6,7), wa (15), st (16) are read.
    cols = [0] * 17
    cols[16] = steal
    return " ".join(str(c) for c in cols) + " " + wall(epoch)


def main():
    d = tempfile.mkdtemp(prefix="drift_selftest_")
    vm_path = os.path.join(d, "vm.log")
    tl_path = os.path.join(d, "bench.timeline.tsv")

    # vmstat trace: 2 s cadence, steal 0 everywhere except a 10 s hot
    # window [B+20, B+30) at 15%.
    with open(vm_path, "w") as f:
        f.write("procs -----------memory---------- ---swap-- ...\n")
        f.write(" r  b   swpd   free ... st                 date time\n")
        for i in range(0, 60, 2):
            st = 15 if 20 <= i < 30 else 0
            f.write(vmstat_line(BASE + i, st) + "\n")

    # timeline: q_cold runs inside the quiet region, q_hot run 2 inside
    # the hot window, q_failed errored (ok=false), q_orphan is outside
    # the trace entirely (zero-overlap, no proc column → excluded),
    # q_subwin runs in a ZERO-steal vmstat region but its own /proc/stat
    # column reads 12.5% (the sub-window spike the 2 s grid hides), and
    # q_orphan2 is outside the trace but carries a proc column (warned
    # about, yet still steal-attributable).
    rows6 = [
        ("q_cold", 1, BASE + 2, BASE + 8, 6.0, "true"),
        ("q_cold", 2, BASE + 10, BASE + 16, 6.0, "true"),
        ("q_hot", 1, BASE + 34, BASE + 40, 6.0, "true"),
        ("q_hot", 2, BASE + 22, BASE + 28, 6.0, "true"),
        ("q_failed", 1, BASE + 42, BASE + 44, 2.0, "false"),
        ("q_orphan", 1, BASE + 500, BASE + 506, 6.0, "true"),
    ]
    rows8 = [
        ("q_subwin", 1, BASE + 46, BASE + 52, 6.0, "true", 48, 12.50),
        ("q_orphan2", 1, BASE + 510, BASE + 516, 6.0, "true", 3, 0.75),
    ]
    # (g — round 14) canary-hot: zero steal everywhere, but q_canhot's
    # pre-run bandwidth canary reads 20 ms against the session's 12 ms
    # floor (1.67x >= 1.5) — the memory-contention class steal cannot see
    rows9 = [
        ("q_canquiet", 1, BASE + 2, BASE + 8, 6.0, "true", 0, 0.00, 12.0),
        ("q_canhot", 1, BASE + 10, BASE + 16, 6.0, "true", 0, 0.00, 20.0),
    ]
    with open(tl_path, "w") as f:
        f.write("query\trun\tstart_epoch\tend_epoch\tsec\tok"
                "\tsteal_ticks\tsteal_pct\tcanary_ms\n")
        for q, r, a, b, sec, ok in rows6:
            f.write(f"{q}\t{r}\t{a:.1f}\t{b:.1f}\t{sec:.3f}\t{ok}\t-\t-\n")
        for q, r, a, b, sec, ok, tk, pct in rows8:
            f.write(f"{q}\t{r}\t{a:.1f}\t{b:.1f}\t{sec:.3f}\t{ok}"
                    f"\t{tk}\t{pct:.2f}\n")
        for q, r, a, b, sec, ok, tk, pct, can in rows9:
            f.write(f"{q}\t{r}\t{a:.1f}\t{b:.1f}\t{sec:.3f}\t{ok}"
                    f"\t{tk}\t{pct:.2f}\t{can:.2f}\n")

    vm = drift_join.parse_vmstat(vm_path)
    assert len(vm) == 30, f"vmstat parse: {len(vm)} != 30"
    runs = drift_join.parse_timeline(tl_path)
    assert len(runs) == 10
    assert runs[4][5] is False, "ok=false not parsed"
    assert runs[6][6] == 12.50, "proc steal_pct not parsed"
    assert runs[0][6] is None, "'-' proc column should parse as None"
    assert runs[0][7] is None, "missing canary column should parse as None"
    assert runs[9][7] == 20.0, "canary_ms not parsed"

    joined, missed = drift_join.join(vm, runs, {})
    assert missed == 2, f"zero-overlap count {missed} != 2 (both orphans)"
    by = {(j[0], j[1]): j for j in joined}
    assert ("q_orphan", 1) not in by
    # a trace-less run WITH a proc column stays attributable
    assert by[("q_orphan2", 1)][9] == 0.75
    # (a) hot window lands on exactly q_hot run 2
    assert by[("q_hot", 2)][4] == 15, "hot run max steal != 15"
    hots = sorted(k for k, j in by.items() if drift_join.hot(j))
    # (f) the sub-window run is hot via its proc column despite zero
    # visible vmstat steal
    assert by[("q_subwin", 1)][4] == 0, "q_subwin vmstat window not quiet"
    assert hots == [("q_hot", 2), ("q_subwin", 1)], \
        f"hot attribution wrong: {hots}"
    assert by[("q_cold", 1)][4] == 0 and by[("q_hot", 1)][4] == 0
    # (e) failed run flagged
    assert by[("q_failed", 1)][8] is False

    # (g) canary-hot classification: q_canhot flagged at 1.67x the
    # session floor despite zero steal everywhere in its window;
    # q_canquiet (the floor itself) stays clean, and steal-hot counting
    # is untouched by the canary column
    floor = drift_join.canary_floor(joined)
    assert floor == 12.0, f"canary floor {floor} != 12.0"
    assert drift_join.canary_hot(by[("q_canhot", 1)], floor)
    assert not drift_join.canary_hot(by[("q_canquiet", 1)], floor)
    assert not drift_join.canary_hot(by[("q_hot", 2)], floor), \
        "canary-less run must not classify canary-hot"

    # (b) stats summary
    st = drift_join.stats(joined, missed, len(runs))
    assert st["steal_max"] == 15 and st["hot_runs"] == 2
    assert st["proc_steal_max"] == 12.50
    assert st["canary_hot_runs"] == 1
    assert st["zero_overlap_runs"] == 2 and st["failed_runs"] == 1
    assert st["joined_runs"] == 9 and st["timeline_runs"] == 10

    # canary-less sessions report canary_hot_runs as None (not 0):
    # "no canary column" must stay distinguishable from "measured quiet"
    no_canary = [j for j in joined if j[10] is None]
    stn = drift_join.stats(no_canary, 0, len(no_canary))
    assert stn["canary_hot_runs"] is None

    # (d) 5-column legacy format still parses, ok defaults True
    legacy = os.path.join(d, "legacy.tsv")
    with open(legacy, "w") as f:
        f.write("query\trun\tstart_epoch\tend_epoch\tsec\n")
        f.write(f"q_old\t1\t{BASE + 2:.1f}\t{BASE + 8:.1f}\t6.000\n")
    lr = drift_join.parse_timeline(legacy)
    assert lr == [("q_old", 1, BASE + 2.0, BASE + 8.0, 6.0, True, None,
                   None)]

    # (c) CLI end-to-end: warning on stderr, stats on stdout
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "drift_join.py"),
         tl_path, vm_path, "--stats-json"],
        capture_output=True, text=True, check=True)
    assert "zero_overlap_runs\": 2".replace(" ", "") in \
        p.stdout.replace(" ", ""), p.stdout
    assert "WARNING" in p.stderr and "ZERO vmstat samples" in p.stderr

    print("drift_join_selftest: ALL GREEN (hot window attributed, "
          "zero-overlap loud, legacy format ok, failed runs flagged, "
          "canary-hot classified against the session floor)")


if __name__ == "__main__":
    main()
