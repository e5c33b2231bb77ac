#!/usr/bin/env bash
# Per-round verification sweep: the driver-style DuckDB oracle compare
# PLUS the Python side-gates (round-7 verdict task 2: run-once tools
# rot — this script makes them part of every round's protocol and fails
# loudly if any gate breaks): ANN recall, g03 triangles, and (round 8)
# the pure-Python decoded-media oracle for m01/m04/m05.
#
# Usage: tools/check_all.sh [sfDir] [verifyOutDir]
#   sfDir        default /root/testdata/sf0.01 (the driver-graded SF)
#   verifyOutDir default /tmp/graft_check_all — populated by running
#                graft.Verify when it does not already hold dumps, so the
#                script works standalone or on top of an existing run
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/graft_check_all}"

if [ ! -f "$OUT_DIR/oracle_sql.json" ]; then
  echo "== graft.Verify $SF_DIR -> $OUT_DIR"
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
fi

echo "== gate 0/6: drift-attribution tooling selftest (synthetic hot window)"
python3 tools/drift_join_selftest.py

echo "== gate 1/6: driver-style DuckDB oracle compare"
python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR"

echo "== gate 2/6: ANN recall cross-engine recomputation (pure-Python kernel)"
python3 tools/ann_recall_oracle.py "$SF_DIR" "$OUT_DIR"

echo "== gate 3/6: g03 temp-table oracle (MATERIALIZED-stage recipe)"
python3 tools/g03_oracle_tt.py "$SF_DIR" "$OUT_DIR"

echo "== gate 4/6: decoded-media third-engine oracle (pure-Python codec)"
python3 tools/media_oracle.py "$SF_DIR" "$OUT_DIR"

echo "== gate 5/6: trained-quantizer third-engine oracle (pure-Python IVF/PQ/SQ8/kNN/SemDeDup/MMR)"
python3 tools/codebook_oracle.py "$SF_DIR" "$OUT_DIR"

echo "== gate 6/6: sketch accuracy-contract bounds (q34/q42/q91 vs DuckDB exact)"
python3 tools/sketch_bounds_oracle.py "$SF_DIR" "$OUT_DIR"

echo "== gate 7: dedup large-SF oracle tooling selftest (factorized guard + brute cross-check)"
python3 tools/dedup_oracle_tt.py --selftest

echo "check_all: ALL GATES GREEN ($SF_DIR)"
