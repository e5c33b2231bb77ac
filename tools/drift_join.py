#!/usr/bin/env python3
"""Incident-level drift attribution: join a Bench per-run timeline
(SPARK_GRAFT_BENCH_TIMELINE TSV — query, run, epoch start/end, sec)
against a concurrent `vmstat -t 2` trace, and report, for each query
run, the host counters observed WHILE it executed: max/mean CPU steal,
max iowait, and swap activity. This is the final step of the round-10
attribution chain: when a query reads slow, this tool answers "was the
host stealing cycles during exactly that window?" with numbers instead
of pattern-matching.

Usage: tools/drift_join.py TIMELINE_TSV VMSTAT_LOG [--threshold-ratio R]
  With --threshold-ratio and a BASELINE.md in the cwd, only runs whose
  sec exceeds R x the query's frozen value are printed (default: print
  the 15 runs with the highest max-steal overlap).
"""
import re
import sys
from datetime import datetime, timezone


def parse_vmstat(path):
    """[(epoch_sec, steal, iowait, swap_in+swap_out)] from vmstat -t."""
    out = []
    for line in open(path):
        parts = line.split()
        # data rows end with "YYYY-MM-DD HH:MM:SS" under -t
        if len(parts) >= 19 and parts[0].lstrip("-").isdigit() \
                and re.match(r"\d{4}-\d{2}-\d{2}", parts[-2] or ""):
            try:
                ts = datetime.strptime(
                    parts[-2] + " " + parts[-1], "%Y-%m-%d %H:%M:%S")
                # vmstat prints LOCAL time; the box runs UTC
                epoch = ts.replace(tzinfo=timezone.utc).timestamp()
                si, so = int(parts[6]), int(parts[7])
                wa, st = int(parts[15]), int(parts[16])
                out.append((epoch, st, wa, si + so))
            except (ValueError, IndexError):
                continue
    return out


def parse_timeline(path):
    rows = []
    for line in open(path):
        if line.startswith("query\t"):
            continue
        q, r, a, b, sec = line.rstrip("\n").split("\t")
        rows.append((q, int(r), float(a), float(b), float(sec)))
    return rows


def frozen_map():
    frozen = {}
    try:
        intable = False
        for line in open("BASELINE.md", encoding="utf-8"):
            if line.startswith("## Per-query seconds"):
                intable = True
                continue
            if intable and line.startswith("## "):
                break
            if intable:
                m = re.match(r"\|\s*([a-z]\w+)\s*\|\s*([0-9.]+)\s*\|", line)
                if m:
                    frozen[m.group(1)] = float(m.group(2))
    except OSError:
        pass
    return frozen


def main():
    timeline, vmlog = sys.argv[1], sys.argv[2]
    ratio = None
    if "--threshold-ratio" in sys.argv:
        ratio = float(sys.argv[sys.argv.index("--threshold-ratio") + 1])
    vm = parse_vmstat(vmlog)
    runs = parse_timeline(timeline)
    frozen = frozen_map()
    joined = []
    for q, r, a, b, sec in runs:
        # pad half a sample either side: a 2 s cadence can straddle
        window = [v for v in vm if a - 1 <= v[0] <= b + 1]
        if not window:
            continue
        mx_st = max(v[1] for v in window)
        mean_st = sum(v[1] for v in window) / len(window)
        mx_wa = max(v[2] for v in window)
        swap = sum(v[3] for v in window)
        fr = frozen.get(q)
        joined.append((q, r, sec, fr, mx_st, mean_st, mx_wa, swap))
    if ratio is not None:
        picked = [j for j in joined if j[3] and j[2] > ratio * j[3]]
        picked.sort(key=lambda j: -(j[2] / j[3]))
    else:
        picked = sorted(joined, key=lambda j: -j[4])[:15]
    print("query                          run    sec  frozen  maxSt%  meanSt%  maxWa%  swap")
    for q, r, sec, fr, mx, mn, wa, sw in picked:
        fr_s = f"{fr:7.3f}" if fr else "      -"
        print(f"{q:30s} {r:3d} {sec:7.3f} {fr_s} {mx:6d} {mn:8.2f} {wa:7d} {sw:5d}")
    if not picked:
        print("(no runs matched)")


if __name__ == "__main__":
    main()
