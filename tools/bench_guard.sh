#!/bin/bash
# Scale-growth + rep-spread SHIPPING GATE (round-10 verdict items: the
# >12x growth flag fired in the shipped r9 artifact with nothing stopping
# it, and r10 shipped a 29 s rep spread on a 7.5 s median ungraded — a
# narrative detector is not a gate).
#
# Reads a bench_out.json (default: ./bench_out.json — run Bench first) and
# applies two flags:
#
#  GROWTH: any query whose fitted per-decade slope (geometric mean of its
#  scale_growth_steps over the real 10x decades — both steps of a 2-step
#  query; the LAST TWO of a 3-step sf1-family query, whose first step is
#  rows-flat below sf0.1) exceeds the flag is re-measured ISOLATED in a
#  fresh JVM (tools/run.sh graft.tools.IsolatedQueryProbe) at all scale
#  points.
#
#  SPREAD: any query whose rep spread exceeds max(2 x median, 2 s) and
#  whose in-suite end-of-run recheck (Bench's spread_arbiter) did NOT come
#  back tight is re-measured isolated in spread mode (5 clean-heap reps,
#  one query, fresh JVM).
#
# The isolated re-measure is the ARBITER in both directions: in-suite wall
# jitter can neither fake a red (a neighbor query's async block release
# inflating one rep) nor fake a green (a real super-linear or erratic
# operator misbehaves in a fresh JVM too). Goes red (exit 1) only if the
# ISOLATED measurement still exceeds the flag.
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

# Arbitrate at the SCALE THE FLAG FIRED AT: the probe's built-in default is
# sf0.1, but the bench may have run elsewhere (SPARK_GRAFT_SF_DIR) — a
# re-measure at a smaller sf could clear a genuinely erratic operator.
SFDIR=$(python3 -c "import json,sys; print(json.load(open(sys.argv[1])).get('sf','/root/testdata/sf0.1'))" "$BENCH")

growth_flagged=$(python3 - "$BENCH" "$FLAG" <<'EOF'
import json, sys, math
d = json.load(open(sys.argv[1]))
flag = float(sys.argv[2])
steps = d.get("scale_growth_steps", {})
growth = d.get("scale_growth", {})
out = []
for q in sorted(set(steps) | set(growth)):
    rs = steps.get(q)
    if rs and len(rs) >= 2 and all(r > 0 for r in rs):
        # fitted per-decade slope = geometric mean over the REAL decades:
        # the first step is rows-flat for the document/embedding families
        # (500 -> 500 docs below sf0.1), so a three-step query is fitted
        # on its last two steps — the decades where rows actually grow
        # 10x — exactly the two-step design applied one decade higher.
        # (A sustained quadratic is high on BOTH; a one-off wall spike is
        # high on one and the fresh-JVM arbiter clears or confirms it.)
        fit = rs[-2:] if len(rs) >= 3 else rs
        slope = math.exp(sum(math.log(r) for r in fit) / len(fit))
    else:
        slope = growth.get(q, 0.0)
    if slope > flag:
        out.append(q)
print(" ".join(out))
EOF
)

spread_flagged=$(python3 - "$BENCH" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
qs, sp = d.get("queries", {}), d.get("spread", {})
arb = d.get("spread_arbiter", {})
out = []
for q in sorted(sp):
    med = qs.get(q, 0.0)
    lim = max(2 * med, 2.0)
    if sp[q] <= lim:
        continue
    a = arb.get(q)
    # Bench's own end-of-suite recheck clears a positional outlier: the
    # query re-ran tight at a different suite position in the same JVM
    if a and a.get("recheck_spread", 1e9) <= \
            max(2 * a.get("recheck_median", 0.0), 2.0):
        continue
    out.append(q)
print(" ".join(out))
EOF
)

if [ -z "$growth_flagged" ] && [ -z "$spread_flagged" ]; then
  echo "BENCH GUARD GREEN: no growth above ${FLAG}x, no unarbitrated spread"
  tools/src_hash.sh > .last_bench_guard_hash
  exit 0
fi

red=0

if [ -n "$growth_flagged" ]; then
  echo "BENCH GUARD: growth-flagged in-suite: $growth_flagged — arbitrating in fresh JVMs"
  for q in $growth_flagged; do
    out=$(tools/run.sh graft.tools.IsolatedQueryProbe "$q" "$SFDIR" 2>/dev/null | tail -1)
    echo "  isolated $q: $out"
    verdict=$(python3 - "$out" "$FLAG" <<'EOF'
import json, sys, math
d = json.loads(sys.argv[1])
flag = float(sys.argv[2])
rs = d.get("steps", [])
if len(rs) >= 2 and all(r > 0 for r in rs):
    fit = rs[-2:] if len(rs) >= 3 else rs
    slope = math.exp(sum(math.log(r) for r in fit) / len(fit))
else:
    slope = d.get("growth", 1e9)
print("RED" if slope > flag else "GREEN", round(slope, 2))
EOF
)
    echo "  arbiter: $q growth $verdict"
    case "$verdict" in RED*) red=1;; esac
  done
fi

if [ -n "$spread_flagged" ]; then
  echo "BENCH GUARD: spread-flagged in-suite: $spread_flagged — arbitrating in fresh JVMs"
  for q in $spread_flagged; do
    out=$(tools/run.sh graft.tools.IsolatedQueryProbe "$q" spread "$SFDIR" 2>/dev/null | tail -1)
    echo "  isolated $q: $out"
    verdict=$(python3 - "$out" <<'EOF'
import json, sys
d = json.loads(sys.argv[1])
med, sp = d.get("median", 0.0), d.get("spread", 1e9)
print("RED" if sp > max(2 * med, 2.0) else "GREEN", round(sp, 2))
EOF
)
    echo "  arbiter: $q spread $verdict"
    case "$verdict" in RED*) red=1;; esac
  done
fi

if [ "$red" -ne 0 ]; then
  echo "BENCH GUARD RED: isolated measurement confirmed a flag — fix before shipping"
  exit 1
fi
echo "BENCH GUARD GREEN: all flagged queries cleared by isolated arbiter"
tools/src_hash.sh > .last_bench_guard_hash
