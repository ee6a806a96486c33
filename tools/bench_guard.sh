#!/bin/bash
# Scale-growth SHIPPING GATE (round-10 verdict item: the >12x flag fired in
# the shipped r9 artifact and nothing stopped it — a narrative detector is
# not a gate).
#
# Reads a bench_out.json (default: ./bench_out.json — run Bench first), and
# for every query whose fitted per-decade growth slope exceeds the flag,
# re-measures that query ISOLATED in a FRESH JVM (tools/run.sh
# graft.tools.IsolatedQueryProbe) at all three scale points. The isolated
# re-measure is the ARBITER in both directions: in-suite wall jitter can
# neither fake a red (a neighbor query's async block release inflating one
# rep) nor fake a green (a real super-linear operator is super-linear in a
# fresh JVM too). Goes red (exit 1) only if the ISOLATED slope still
# exceeds the flag.
#
# On green, records tools/src_hash.sh to .last_bench_guard_hash so the
# round log can prove which tree the gate certified.
#
# Usage: tools/bench_guard.sh [bench_out.json] [flag]
set -euo pipefail
cd "$(dirname "$0")/.."
BENCH="${1:-bench_out.json}"
FLAG="${2:-12}"

if [ ! -f "$BENCH" ]; then
  echo "BENCH GUARD: no $BENCH — run Bench first (tools/run.sh graft.Bench)" >&2
  exit 1
fi

# Staleness check: a bench file older than the newest behavior-bearing
# source cannot certify the current tree — with no flags in the stale file
# the guard would go green without measuring anything, then stamp the
# CURRENT tree hash as 'certified'. Exit 3 (distinct from flag-red 1) so
# callers can choose to warn (mid-round sweeps) or hard-fail (shipping).
newer=$(find src build.sbt -name '*.scala' -newer "$BENCH" 2>/dev/null | head -1)
if [ -n "$newer" ]; then
  echo "BENCH GUARD STALE: $newer is newer than $BENCH — rerun Bench" >&2
  exit 3
fi

flagged=$(python3 - "$BENCH" "$FLAG" <<'EOF'
import json, sys, math
d = json.load(open(sys.argv[1]))
flag = float(sys.argv[2])
steps = d.get("scale_growth_steps", {})
growth = d.get("scale_growth", {})
out = []
for q in sorted(set(steps) | set(growth)):
    rs = steps.get(q)
    if rs and len(rs) == 2 and all(r > 0 for r in rs):
        slope = math.sqrt(rs[0] * rs[1])   # per-decade geometric mean
    else:
        slope = growth.get(q, 0.0)
    if slope > flag:
        out.append(q)
print(" ".join(out))
EOF
)

if [ -z "$flagged" ]; then
  echo "BENCH GUARD GREEN: no query above the ${FLAG}x per-decade flag"
  tools/src_hash.sh > .last_bench_guard_hash
  exit 0
fi

echo "BENCH GUARD: flagged in-suite: $flagged — arbitrating in fresh JVMs"
red=0
for q in $flagged; do
  out=$(tools/run.sh graft.tools.IsolatedQueryProbe "$q" 2>/dev/null | tail -1)
  echo "  isolated $q: $out"
  verdict=$(python3 - "$out" "$FLAG" <<'EOF'
import json, sys, math
d = json.loads(sys.argv[1])
flag = float(sys.argv[2])
rs = d.get("steps", [])
slope = math.sqrt(rs[0] * rs[1]) if len(rs) == 2 and all(r > 0 for r in rs) \
    else d.get("growth", 1e9)
print("RED" if slope > flag else "GREEN", round(slope, 2))
EOF
)
  echo "  arbiter: $q $verdict"
  case "$verdict" in RED*) red=1;; esac
done

if [ "$red" -ne 0 ]; then
  echo "BENCH GUARD RED: isolated growth above ${FLAG}x — fix before shipping"
  exit 1
fi
echo "BENCH GUARD GREEN: all flagged queries cleared by isolated arbiter"
tools/src_hash.sh > .last_bench_guard_hash
