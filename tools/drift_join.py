#!/usr/bin/env python3
"""Incident-level drift attribution: join a Bench per-run timeline
(SPARK_GRAFT_BENCH_TIMELINE TSV — query, run, epoch start/end, sec, ok)
against a concurrent `vmstat -t 2` trace, and report, for each query
run, the host counters observed WHILE it executed: max/mean CPU steal,
max iowait, and swap activity. This is the final step of the round-10
attribution chain: when a query reads slow, this tool answers "was the
host stealing cycles during exactly that window?" with numbers instead
of pattern-matching.

Usage: tools/drift_join.py TIMELINE_TSV VMSTAT_LOG
         [--threshold-ratio R] [--tz utc|local] [--stats-json]
  --threshold-ratio R  with a BASELINE.md in the cwd, only print runs
      whose sec exceeds R x the query's frozen value (default: print
      the 15 runs with the highest max-steal overlap).
  --tz utc|local  how to interpret vmstat -t timestamps (vmstat prints
      LOCAL time; default 'local' resolves via the host zone, which on
      a UTC box is identical to 'utc' — the flag exists so a non-UTC
      host cannot silently join wrong windows).
  --stats-json  print ONE JSON object summarizing steal exposure over
      the whole session (for quiet_bench.sh to merge into the bench
      record) instead of the per-run table.
"""
import json
import re
import sys
from datetime import datetime, timezone

HOT_STEAL_PCT = 5  # a run is "hot" if max steal in its window >= this
# a run is "canary-hot" if its pre-run bandwidth-canary reading is >=
# this ratio of the SESSION's canary minimum (the uncontended machine
# speed — Bench's canary doc). 1.5x = the machine's effective memory
# bandwidth was down >=33% when the run started: the contention class
# CPU-steal counters cannot see (r13 session F: st16 at 2.53x with
# 0.96% steal, canary elevated — this classification makes that reading
# arrive pre-attributed, the r13 carry-forward item 4).
CANARY_HOT_RATIO = 1.5
# Cross-session quiet canary baseline (BASELINE.md: 11.9-12.9 ms on quiet
# days; r15 sessions read 9.4-10.6). The canary FLOOR used for hot
# classification is min(session_min, this): a session where every run
# starts under bandwidth contention has an ELEVATED own-minimum and would
# otherwise classify itself canary_hot_runs=0 (ADVICE r14). A faster
# machine (session min below the baseline) keeps its own lower floor.
CANARY_QUIET_BASELINE_MS = 13.0


def parse_vmstat(path, tz="local"):
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
                # vmstat prints LOCAL wall time (ADVICE r10: hardcoding
                # UTC silently mis-joins every window on a non-UTC host).
                # astimezone() on a naive datetime attaches the host zone.
                if tz == "utc":
                    epoch = ts.replace(tzinfo=timezone.utc).timestamp()
                else:
                    epoch = ts.astimezone().timestamp()
                si, so = int(parts[6]), int(parts[7])
                wa, st = int(parts[15]), int(parts[16])
                out.append((epoch, st, wa, si + so))
            except (ValueError, IndexError):
                continue
    return out


def parse_timeline(path):
    """[(query, run, start, end, sec, ok, proc_steal_pct|None,
    canary_ms|None)] — ok defaults True for the 5-column pre-round-11
    format, proc_steal_pct is None for pre-round-12 timelines (no
    per-run /proc/stat column), and canary_ms is None for pre-round-13
    ones (no bandwidth-canary column), so archived timelines stay
    joinable. When present, proc_steal_pct is the run's EXACT steal
    share over its own window — authoritative where the 2 s vmstat grid
    can average a sub-window spike down to zero (the round-11 run-B
    blindness) — and canary_ms is the machine's effective memory speed
    just before the run (constant bandwidth-bound work; elevated =
    co-tenant memory pressure no CPU counter sees)."""
    rows = []
    for line in open(path):
        if line.startswith("query\t"):
            continue
        f = line.rstrip("\n").split("\t")
        if len(f) < 5:
            continue
        ok = f[5].strip().lower() == "true" if len(f) >= 6 else True
        proc_st = None
        if len(f) >= 8 and f[7].strip() not in ("", "-"):
            try:
                proc_st = float(f[7])
            except ValueError:
                pass
        canary = None
        if len(f) >= 9 and f[8].strip() not in ("", "-"):
            try:
                canary = float(f[8])
            except ValueError:
                pass
        rows.append((f[0], int(f[1]), float(f[2]), float(f[3]),
                     float(f[4]), ok, proc_st, canary))
    return rows


def frozen_map():
    """query -> frozen seconds; value may legitimately be 0.0, and a
    missing query is represented by ABSENCE (ADVICE r10: callers must
    use `is not None`, not truthiness)."""
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


def join(vm, runs, frozen):
    """[(q, run, sec, frozen|None, max_st, mean_st, max_wa, swap, ok,
    proc_st|None)]. Runs overlapping ZERO vmstat samples are reported to
    stderr (ADVICE r10: skipping them silently hides a dead/late trace)
    and excluded — unless the run carries its OWN /proc/stat steal
    column, which needs no trace to attribute."""
    joined, missed = [], 0
    for q, r, a, b, sec, ok, proc_st, canary in runs:
        # pad half a sample either side: a 2 s cadence can straddle
        window = [v for v in vm if a - 1 <= v[0] <= b + 1]
        if not window:
            # the warning below still fires (iowait/swap attribution IS
            # missing), but a run carrying its own /proc/stat or canary
            # column is attributable without any trace — keep it
            missed += 1
            if proc_st is None and canary is None:
                continue
        mx_st = max((v[1] for v in window), default=0)
        mean_st = (sum(v[1] for v in window) / len(window)) if window else 0.0
        mx_wa = max((v[2] for v in window), default=0)
        swap = sum(v[3] for v in window)
        joined.append((q, r, sec, frozen.get(q), mx_st, mean_st, mx_wa,
                       swap, ok, proc_st, canary))
    if missed:
        print(f"WARNING: {missed}/{len(runs)} timeline runs overlap ZERO "
              "vmstat samples — trace dead, late, or joined with the wrong "
              "--tz; their attribution is MISSING, not clean.",
              file=sys.stderr)
    return joined, missed


def hot(j):
    """A run is hot if EITHER steal signal says so: the vmstat window max
    OR the run's own /proc/stat delta (which catches sub-window spikes
    the 2 s grid averages away — the round-11 run-B class)."""
    return j[4] >= HOT_STEAL_PCT or \
        (j[9] is not None and j[9] >= HOT_STEAL_PCT)


def canary_floor(joined):
    """The session's uncontended memory speed: the min canary reading,
    capped at the frozen cross-session quiet baseline so a uniformly
    bandwidth-stormed session cannot use its own elevated minimum as the
    'quiet' yardstick (ADVICE r14). None when the timeline predates the
    canary column."""
    cs = [j[10] for j in joined if j[10] is not None]
    return min(min(cs), CANARY_QUIET_BASELINE_MS) if cs else None


def canary_hot(j, floor):
    """A run is canary-hot if its pre-run bandwidth reading is >=
    CANARY_HOT_RATIO x the session's own canary minimum — memory-
    bandwidth/LLC contention that steal counters cannot see (the r13
    session-F st16 class)."""
    return floor is not None and j[10] is not None \
        and j[10] >= CANARY_HOT_RATIO * floor


def stats(joined, missed, n_runs):
    """Session-level steal + bandwidth exposure for the bench record."""
    if not joined:
        return {"steal_max": None, "steal_mean": None, "hot_runs": None,
                "proc_steal_max": None, "canary_hot_runs": None,
                "joined_runs": 0, "timeline_runs": n_runs,
                "zero_overlap_runs": missed, "failed_runs": 0}
    proc = [j[9] for j in joined if j[9] is not None]
    floor = canary_floor(joined)
    return {
        "steal_max": max(j[4] for j in joined),
        "steal_mean": round(sum(j[5] for j in joined) / len(joined), 3),
        "hot_runs": sum(1 for j in joined if hot(j)),
        # exact per-run /proc/stat ceiling (None on pre-round-12
        # timelines): the sub-window-proof counterpart of steal_max
        "proc_steal_max": round(max(proc), 2) if proc else None,
        # runs whose pre-run canary read >= 1.5x the session min —
        # bandwidth contention invisible to every steal key above
        # (None on pre-round-13 timelines without the canary column)
        "canary_hot_runs": (sum(1 for j in joined if canary_hot(j, floor))
                            if floor is not None else None),
        "joined_runs": len(joined),
        "timeline_runs": n_runs,
        "zero_overlap_runs": missed,
        "failed_runs": sum(1 for j in joined if not j[8]),
    }


def main():
    timeline, vmlog = sys.argv[1], sys.argv[2]
    ratio = None
    if "--threshold-ratio" in sys.argv:
        ratio = float(sys.argv[sys.argv.index("--threshold-ratio") + 1])
    tz = "local"
    if "--tz" in sys.argv:
        tz = sys.argv[sys.argv.index("--tz") + 1]
    vm = parse_vmstat(vmlog, tz)
    runs = parse_timeline(timeline)
    frozen = frozen_map()
    joined, missed = join(vm, runs, frozen)
    if "--stats-json" in sys.argv:
        print(json.dumps(stats(joined, missed, len(runs))))
        return
    floor = canary_floor(joined)
    if ratio is not None:
        picked = [j for j in joined
                  if j[3] is not None and j[2] > ratio * j[3]]
        picked.sort(key=lambda j: -(j[2] / j[3] if j[3] else float("inf")))
    else:
        picked = sorted(
            joined,
            key=lambda j: -max(j[4], j[9] if j[9] is not None else 0))[:15]
    print("query                          run    sec  frozen  maxSt%  "
          "meanSt%  procSt%  maxWa%  swap  canaryRt  ok")
    for j in picked:
        q, r, sec, fr, mx, mn, wa, sw, ok, pst, can = j
        fr_s = f"{fr:7.3f}" if fr is not None else "      -"
        pst_s = f"{pst:7.2f}" if pst is not None else "      -"
        can_s = (f"{can / floor:8.2f}" if can is not None and floor
                 else "       -")
        flags = ("" if ok else "  FAILED-RUN") + \
            ("  CANARY-HOT" if canary_hot(j, floor) else "")
        print(f"{q:30s} {r:3d} {sec:7.3f} {fr_s} {mx:6d} {mn:8.2f} "
              f"{pst_s} {wa:7d} {sw:5d} {can_s}{flags}")
    if not picked:
        print("(no runs matched)")


if __name__ == "__main__":
    main()
