#!/bin/bash
# Full pre-snapshot sweep — the mechanical form of the artifact-only rule.
#
# Runs the complete gate (`sbt test` + Verify dump at both sfs + DuckDB
# oracle compare), REFUSES to go green if any `*.FAILED` marker exists in
# either verify output (closes the checker's absent-vs-failed blind spot:
# a query that crashes must fail the sweep, not vanish from the report),
# and on success records a content hash of src/ to `.last_sweep_src_hash`.
#
# The snapshot rule is then checkable, not aspirational:
#     tools/snapshot_guard.sh
# exits nonzero if src/ changed since the last green sweep — run it before
# any end-of-round/“artifact-only” commit. Twice (r5, r7) un-swept source
# rode the snapshot commit and shipped red driver rows; this pins the rule
# to a hash instead of discipline.
#
# Usage: tools/sweep.sh [query ...]   (optional args restrict Verify's dump)
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch test

for sf in 0.001 0.01; do
  out="/tmp/graft_sweep_sf$sf"
  rm -rf "$out"
  tools/run.sh graft.Verify "/root/testdata/sf$sf" "$out" "$@"
  failed=$(ls "$out"/*.FAILED 2>/dev/null || true)
  if [ -n "$failed" ]; then
    echo "SWEEP RED: FAILED markers at sf$sf:"
    echo "$failed"
    exit 1
  fi
  python3 tools/oracle_check.py "/root/testdata/sf$sf" "$out" "$@"
done

# Only a FULL sweep (no query-restricting args) may record the green hash:
# a narrowed Verify certifies only the named queries, and letting it write
# the hash would have snapshot_guard certify the whole tree off a partial
# run — exactly the gap the guard exists to close.
if [ "$#" -eq 0 ]; then
  # Scale-growth gate (r9 shipped a 16.8x-growth query with the detector
  # only narrating): if a CURRENT bench file exists, any query flagged
  # above the per-decade growth limit is re-measured ISOLATED in a fresh
  # JVM (tools/bench_guard.sh) and a confirmed super-linear query turns
  # the whole sweep red. A missing or STALE bench file (source changed
  # since it was measured — guard exit 3) is only warned: sweeps
  # legitimately run mid-round before the next bench, and the guard never
  # stamps a certification hash off a stale file, so a round cannot SHIP
  # growth-uncertified (the closing sequence is bench -> guard -> sweep).
  if [ -f bench_out.json ]; then
    rc=0; tools/bench_guard.sh bench_out.json || rc=$?
    if [ "$rc" -eq 3 ]; then
      echo "SWEEP NOTE: bench_out.json is stale — growth gate not exercised" >&2
    elif [ "$rc" -ne 0 ]; then
      exit "$rc"
    fi
  else
    echo "SWEEP NOTE: no bench_out.json — growth gate not exercised" >&2
  fi
  tools/src_hash.sh > .last_sweep_src_hash
  echo "SWEEP GREEN: src hash $(cat .last_sweep_src_hash)"
else
  echo "SWEEP GREEN (partial: $*) — hash NOT recorded; run a full sweep before snapshotting"
fi
