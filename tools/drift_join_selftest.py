#!/usr/bin/env python3
"""Smoke test for the drift-attribution join (round-11 verdict item 4):
synthesizes a Bench timeline and a vmstat -t trace containing ONE hot
steal window, and asserts that drift_join (a) attributes the hot window
to exactly the run that executed inside it, (b) counts it in
--stats-json, (c) reports zero-overlap runs loudly instead of silently
skipping them, (d) still parses the 5-column pre-round-11 timeline
format, and (e) distinguishes failed (ok=false) runs.

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
    # the trace entirely (zero-overlap).
    rows = [
        ("q_cold", 1, BASE + 2, BASE + 8, 6.0, "true"),
        ("q_cold", 2, BASE + 10, BASE + 16, 6.0, "true"),
        ("q_hot", 1, BASE + 34, BASE + 40, 6.0, "true"),
        ("q_hot", 2, BASE + 22, BASE + 28, 6.0, "true"),
        ("q_failed", 1, BASE + 42, BASE + 44, 2.0, "false"),
        ("q_orphan", 1, BASE + 500, BASE + 506, 6.0, "true"),
    ]
    with open(tl_path, "w") as f:
        f.write("query\trun\tstart_epoch\tend_epoch\tsec\tok\n")
        for q, r, a, b, sec, ok in rows:
            f.write(f"{q}\t{r}\t{a:.1f}\t{b:.1f}\t{sec:.3f}\t{ok}\n")

    vm = drift_join.parse_vmstat(vm_path)
    assert len(vm) == 30, f"vmstat parse: {len(vm)} != 30"
    runs = drift_join.parse_timeline(tl_path)
    assert len(runs) == 6
    assert runs[4][5] is False, "ok=false not parsed"

    joined, missed = drift_join.join(vm, runs, {})
    assert missed == 1, f"zero-overlap count {missed} != 1 (q_orphan)"
    by = {(j[0], j[1]): j for j in joined}
    assert ("q_orphan", 1) not in by
    # (a) hot window lands on exactly q_hot run 2
    assert by[("q_hot", 2)][4] == 15, "hot run max steal != 15"
    hot = [k for k, j in by.items() if j[4] >= drift_join.HOT_STEAL_PCT]
    assert hot == [("q_hot", 2)], f"hot attribution wrong: {hot}"
    assert by[("q_cold", 1)][4] == 0 and by[("q_hot", 1)][4] == 0
    # (e) failed run flagged
    assert by[("q_failed", 1)][8] is False

    # (b) stats summary
    st = drift_join.stats(joined, missed, len(runs))
    assert st["steal_max"] == 15 and st["hot_runs"] == 1
    assert st["zero_overlap_runs"] == 1 and st["failed_runs"] == 1
    assert st["joined_runs"] == 5 and st["timeline_runs"] == 6

    # (d) 5-column legacy format still parses, ok defaults True
    legacy = os.path.join(d, "legacy.tsv")
    with open(legacy, "w") as f:
        f.write("query\trun\tstart_epoch\tend_epoch\tsec\n")
        f.write(f"q_old\t1\t{BASE + 2:.1f}\t{BASE + 8:.1f}\t6.000\n")
    lr = drift_join.parse_timeline(legacy)
    assert lr == [("q_old", 1, BASE + 2.0, BASE + 8.0, 6.0, True)]

    # (c) CLI end-to-end: warning on stderr, stats on stdout
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "drift_join.py"),
         tl_path, vm_path, "--stats-json"],
        capture_output=True, text=True, check=True)
    assert "zero_overlap_runs\": 1".replace(" ", "") in \
        p.stdout.replace(" ", ""), p.stdout
    assert "WARNING" in p.stderr and "ZERO vmstat samples" in p.stderr

    print("drift_join_selftest: ALL GREEN (hot window attributed, "
          "zero-overlap loud, legacy format ok, failed runs flagged)")


if __name__ == "__main__":
    main()
