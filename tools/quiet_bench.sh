#!/usr/bin/env bash
# Quiet-box full-suite bench with an OS-level trace (round-10 verdict
# item 1): runs graft.Bench while vmstat samples every 2 s with wall
# timestamps, so a sub-second alphabetic-block slowdown can be
# ATTRIBUTED — host CPU steal (st), swap (si/so), IO wait (wa), or a
# competing process (us/sy with high r) — instead of pattern-matched
# to "the documented drift class". Bench prints per-query wall times;
# joining them against the vmstat timeline by timestamp localizes any
# anomaly to an OS cause (or rules one out).
#
# Usage: tools/quiet_bench.sh OUT_JSON VMSTAT_LOG [RUNS]
#   OUT_JSON   where Bench writes its one-line JSON
#   VMSTAT_LOG where the vmstat -t trace lands
#   RUNS       min-of-N per query (default 3; the re-freeze protocol)
# Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
#      SPARK_GRAFT_BENCH_ONLY for targeted probes.
#
# The box must be otherwise idle (no concurrent sbt/spark/python jobs)
# or the run is invalid for freezing — BASELINE.md protocol.
set -euo pipefail
out=$1
vm=$2
runs=${3:-3}
vmstat -t 2 > "$vm" &
vpid=$!
trap 'kill "$vpid" 2>/dev/null || true' EXIT
SPARK_GRAFT_BENCH_RUNS=$runs \
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_BENCH_OUT="$out" \
  SPARK_GRAFT_BENCH_TIMELINE="${vm%.log}.timeline.tsv" \
  sbt -batch "runMain graft.Bench"
# incident-level join: per-run host counters while each query executed
# (tools/drift_join.py "${vm%.log}.timeline.tsv" "$vm")
