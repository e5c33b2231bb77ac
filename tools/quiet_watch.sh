#!/usr/bin/env bash
# Storm-dodging launcher for the quiet bench protocol (round 13): poll
# /proc/stat and launch tools/quiet_bench.sh only when two consecutive
# 30 s windows read < 0.4% hypervisor steal AND < 3% non-idle CPU.
# The second gate matters: a concurrent local job (sbt, python oracle)
# shows up as user/sys, not steal, so a steal-only gate would let the
# watcher fire mid-compile and contaminate the session invisibly to
# every steal metric. The launch gate cannot prevent a storm ARRIVING
# mid-session (round 13 caught one in 2 of 2 watcher launches) — the
# per-run /proc/stat columns in the timeline remain the authority on
# which runs were actually quiet.
#
# Usage: nohup tools/quiet_watch.sh BENCH_NAME VMSTAT_NAME [RUNS] &
#   launches tools/quiet_bench.sh plans/BENCH_NAME.json
#   plans/VMSTAT_NAME.log RUNS (default 3) when the window opens; gives
#   up after ~200 min of no calm window. RUNS=2 shortens the session by
#   a third — on a day of recurring bursts (r14: three consecutive
#   sessions storm-hit mid-run) a shorter window is likelier to stay
#   clean, and min-of-2 is conservative (fewer mins can only read high).
# The busy gate was tightened from 8% to 3% after a local[4] test JVM
# averaged under 8% across a 30 s window and let a launch race it.
cd /root/repo
# Bandwidth canary in the LAUNCH gate (r15, VERDICT r14 task 1): the
# r13/r14 storms were bandwidth-visible at near-zero steal, so a
# steal+busy gate happily launched into bursts the in-bench canary then
# measured. Same idea as Bench.canaryMs, host-side: median of 3 timed
# 128 MB buffer copies (memory-bound, CPU-trivial). Threshold is the
# frozen quiet reading for this box (~90 ms median over an idle sample,
# r15) with ~1.4x headroom; override with GRAFT_CANARY_MAX_MS when the
# hardware changes. (The in-bench JVM canary's 12-13 ms scale is a
# different kernel — this one includes the 128 MB allocation.)
canary_max=${GRAFT_CANARY_MAX_MS:-125}
canary_ms() {
  python3 -c "
import time
buf = bytearray(128*1024*1024)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); b = bytes(buf)
    ts.append((time.perf_counter()-t0)*1000)
print(f'{sorted(ts)[1]:.1f}')"
}
consec=0
for i in $(seq 1 400); do
  read s0 b0 t0 < <(python3 -c "
f=[int(x) for x in open('/proc/stat').readline().split()[1:]]
print(f[7], f[0]+f[1]+f[2]+f[4]+f[5]+f[6], sum(f[:8]))")
  sleep 30
  read s1 b1 t1 < <(python3 -c "
f=[int(x) for x in open('/proc/stat').readline().split()[1:]]
print(f[7], f[0]+f[1]+f[2]+f[4]+f[5]+f[6], sum(f[:8]))")
  cms=$(canary_ms)
  ok=$(python3 -c "
st=100*($s1-$s0)/($t1-$t0); busy=100*($b1-$b0)/($t1-$t0)
print(f'steal={st:.2f} busy={busy:.2f} canary={$cms:.1f}ms',
      1 if (st<0.4 and busy<3 and $cms<$canary_max) else 0)")
  echo "window $i: $ok consec=$consec"
  if [ "${ok##* }" = "1" ]; then consec=$((consec+1)); else consec=0; fi
  if [ "$consec" -ge 2 ]; then
    echo "QUIET at $(date) — launching session $1"
    tools/quiet_bench.sh "plans/$1.json" "plans/$2.log" "${3:-3}"
    exit 0
  fi
done
echo "no quiet window found in budget"
exit 1
