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
#  rows-flat below sf0.1) OR whose single WORST step exceeds the flag
#  (r11 verdict item #1: the geomean waved through a 16.4x and an 18.1x
#  FINAL decade) is arbitrated. Arbitration order:
#    1. FLOOR: if the bench file carries scale_growth_floors for the
#       query (candidate/proposal volume per scale point, else output
#       rows), each offending step is cleared when its time ratio tracks
#       the floor's growth — time_ratio <= FLOOR_K x floor_ratio. An
#       output/candidate-bound operator (triangle counts, exact-join
#       candidate volume) is thereby machine-exonerated instead of
#       NOTES-exonerated.
#    2. EMBEDDED (r12 verdict #1a): Bench now arbitrates floor-refused
#       steps ITSELF at the end of the growth pass (clean heap,
#       median-of-reps per scale point) and embeds the verdict row in
#       the artifact's `guard` field — the artifact is self-certifying
#       no matter which box produced it. An embedded GREEN clears the
#       flag here; an embedded RED (or an artifact without the row)
#       falls through to the fresh-JVM probe.
#    3. ISOLATED: otherwise the query is re-measured in a fresh JVM
#       (tools/run.sh graft.tools.IsolatedQueryProbe) at all scale
#       points; red only if the isolated slope/worst step still exceeds
#       the flag.
#
#  SPREAD: any query whose rep spread exceeds max(2 x median, 2 s) and
#  whose in-suite end-of-run recheck (Bench's spread_arbiter) did NOT come
#  back tight is re-measured isolated in spread mode (5 clean-heap reps,
#  one query, fresh JVM).
#
#  ENVELOPE (r11 verdict item #2): the publish envelope's median MB/s
#  must clear a 20 MB/s floor (~17x the reference's ~1.2) and its rep
#  spread the max(2 x median, 2 s) rule; a violation is re-measured by a
#  fresh-JVM envelope probe before it can go red.
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

# FLOOR_K: a flagged time step is floor-cleared when its time ratio is
# within FLOOR_K x the floor metric's ratio over the same step — time may
# carry fixed overheads and per-candidate cost drift, but it must TRACK
# the floor's order of growth to be exonerated by it.
FLOOR_K="${FLOOR_K:-2.0}"

growth_eval=$(python3 - "$BENCH" "$FLAG" "$FLOOR_K" <<'EOF'
import json, sys, math
d = json.load(open(sys.argv[1]))
flag = float(sys.argv[2])
floor_k = float(sys.argv[3])
steps = d.get("scale_growth_steps", {})
growth = d.get("scale_growth", {})
floors = d.get("scale_growth_floors", {})
for q in sorted(set(steps) | set(growth)):
    rs = steps.get(q)
    if rs and len(rs) >= 2 and all(r > 0 for r in rs):
        # fitted per-decade slope = geometric mean over the REAL decades:
        # the first step is rows-flat for the document/embedding families
        # (500 -> 500 docs below sf0.1), so a three-step query is fitted
        # on its last two steps — the decades where rows actually grow
        # 10x — exactly the two-step design applied one decade higher.
        fit = rs[-2:] if len(rs) >= 3 else rs
        slope = math.exp(sum(math.log(r) for r in fit) / len(fit))
        # worst over the FITTED window only: a 3-step query's first step
        # is rows-flat by the same rationale the fit excludes it — its
        # ratio is fixed-overhead noise with a ~1.0 floor ratio, so
        # flagging it would be an unarbitrable false red
        worst = max(fit)
    else:
        slope = worst = growth.get(q, 0.0)
        rs = fit = None
    if slope <= flag and worst <= flag:
        continue
    # Floor arbitration: every offending step must track its floor ratio.
    # The CANDIDATE/proposal floor is authoritative when recorded (the
    # work any correct plan must do): if the query carries a cand array,
    # its verdict is FINAL — a cand-refuted or invalid-point (-1) step
    # must ISOLATE, never fall through to the softer rows floor (output
    # rows could grow 10x while the recorded work floor refutes the step).
    fl = floors.get(q, {})
    cleared = []
    if fit:
        kind = "cand" if "cand" in fl else ("rows" if "rows" in fl else None)
        # floor arrays hold the scale POINTS [tiny, small, big(, sf1)];
        # fitted step i corresponds to points at the array TAIL
        pts = fl.get(kind) if kind else None
        if pts and len(pts) == len(rs) + 1:
            tail = pts[-(len(fit) + 1):]
            ok = True
            detail = []
            for i, r in enumerate(fit):
                if r <= flag:
                    continue
                if tail[i] <= 0 or tail[i + 1] <= 0:
                    ok = False
                    break
                fr = tail[i + 1] / tail[i]
                if r > floor_k * fr:
                    ok = False
                    break
                detail.append(f"step{i}:time={r}x<=({floor_k}x)floor={fr:.1f}x")
            if ok and detail:
                cleared = [kind] + detail
    if cleared:
        print(f"cleared {q} floor={cleared[0]} {' '.join(cleared[1:])}")
        continue
    # Embedded in-artifact arbitration (Bench's own end-of-growth
    # re-measure): a GREEN verdict row makes the artifact self-certifying.
    emb = (d.get("guard") or {}).get("queries", {}).get(q, {})
    if emb.get("status") == "arbitrated" and \
            (emb.get("isolated") or {}).get("verdict") == "GREEN":
        iso = emb["isolated"]
        print(f"cleared {q} embedded steps={iso.get('steps')}")
    else:
        print(f"isolate {q}")
EOF
)
growth_flagged=$(printf '%s\n' "$growth_eval" | awk '$1=="isolate"{print $2}' | xargs echo)
floor_cleared=$(printf '%s\n' "$growth_eval" | grep '^cleared' || true)
if [ -n "$floor_cleared" ]; then
  echo "BENCH GUARD: floor-arbitrated GREEN (time tracks the recorded floor):"
  printf '%s\n' "$floor_cleared" | sed 's/^cleared /  /'
fi

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
    # query re-ran tight at a different suite position in the same JVM.
    # Since r14 the row also NAMES its cause (attribution from the
    # per-rep compile/GC channels) — print it so the clearance is
    # attributed on the guard's own record, not just in the artifact.
    if a and a.get("recheck_spread", 1e9) <= \
            max(2 * a.get("recheck_median", 0.0), 2.0):
        print(f"# cleared {q} attribution="
              f"{a.get('attribution', 'unrecorded')}", file=sys.stderr)
        continue
    out.append(q)
print(" ".join(out))
EOF
)

# Envelope gate: median MB/s floor (20 ~ 17x the reference's ~1.2) +
# the query spread rule applied to the envelope's reps. Old bench files
# without reps fall back to the single-shot mb_per_sec for the floor.
env_flagged=$(python3 - "$BENCH" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
e = d.get("publish_envelope") or {}
if not e:
    print("")
    sys.exit(0)
mbps = e.get("mb_per_sec", 0.0)
med = e.get("sec", 0.0)
sp = e.get("spread_sec")
bad = mbps < 20.0 or (sp is not None and sp > max(2 * med, 2.0))
print("publish_envelope" if bad else "")
EOF
)

# PQ/IVF-sweep floor gate (r14): each sweep row asserts its recall floor.
# Recall here is DETERMINISTIC (seeded codebooks, fixed training sample),
# so a false row is a real quality regression — direct red, no wall-jitter
# arbiter applies. Old artifacts without the field pass vacuously.
pq_flagged=$(python3 - "$BENCH" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
bad = [f"{r.get('arm')}:m{r.get('m')}x{r.get('ksub')}"
       f"(recall={r.get('recall')}<floor={r.get('floor')})"
       for r in d.get("pq_sweep", []) if r.get("ok") is False]
bad += [f"ivf:c{r.get('nCentroids')}p{r.get('nProbe')}"
        f"(recall={r.get('recall')}<floor={r.get('floor')})"
        for r in d.get("ivf_sweep", []) if r.get("ok") is False]
print(" ".join(bad))
EOF
)
if [ -n "$pq_flagged" ]; then
  echo "BENCH GUARD RED: sweep recall floor violated: $pq_flagged" >&2
  exit 1
fi

# Cross-run anchor-normalized comparison (r14, informational): when
# BENCH_BASELINE names a previous artifact, divide both runs' walls by
# their anchor_sec (the fixed CPU+shuffle calibration timed first) before
# comparing — r13's 15% driver-vs-builder gap was pure box speed, which
# the anchors absorb. Reports shared-query normalized regressions > 2x;
# informational (cross-round deltas include legitimate operator changes),
# the in-run gates above remain the shipping verdict.
if [ -n "${BENCH_BASELINE:-}" ] && [ -f "${BENCH_BASELINE}" ]; then
  python3 - "$BENCH" "$BENCH_BASELINE" <<'EOF'
import json, sys
cur = json.load(open(sys.argv[1]))
base = json.load(open(sys.argv[2]))
ac, ab = cur.get("anchor_sec"), base.get("anchor_sec")
if not ac or not ab:
    print("BENCH GUARD: anchor missing on one side — raw comparison only")
    ac = ab = 1.0
qc, qb = cur.get("queries", {}), base.get("queries", {})
shared = sorted(set(qc) & set(qb))
regs = []
for q in shared:
    if qb[q] <= 0.05:
        continue  # sub-noise baselines normalize meaninglessly
    r = (qc[q] / ac) / (qb[q] / ab)
    if r > 2.0:
        regs.append(f"{q}={r:.2f}x")
tc = sum(qc[q] for q in shared) / ac
tb = sum(qb[q] for q in shared) / ab
print(f"BENCH GUARD anchor-normalized vs baseline: anchors "
      f"{ac:.3f}s/{ab:.3f}s, shared-total ratio {tc/tb:.3f} "
      f"({len(shared)} shared queries)")
if regs:
    print("BENCH GUARD: anchor-normalized >2x on: " + " ".join(regs))
else:
    print("BENCH GUARD: no shared query regressed >2x anchor-normalized")
EOF
fi

if [ -z "$growth_flagged" ] && [ -z "$spread_flagged" ] && [ -z "$env_flagged" ]; then
  echo "BENCH GUARD GREEN: no growth above ${FLAG}x (worst step incl.), no unarbitrated spread, envelope above floor"
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
    # same fitted-window worst as the in-suite flag: the excluded first
    # step is rows-flat fixed overhead, not operator growth
    worst = max(fit)
else:
    slope = worst = d.get("growth", 1e9)
print("RED" if slope > flag or worst > flag else "GREEN",
      round(slope, 2), "worst", round(worst, 2))
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

if [ -n "$env_flagged" ]; then
  echo "BENCH GUARD: envelope flagged in-suite — arbitrating in a fresh JVM"
  out=$(tools/run.sh graft.tools.IsolatedQueryProbe publish_envelope "$SFDIR" 2>/dev/null | tail -1)
  echo "  isolated envelope: $out"
  verdict=$(python3 - "$out" <<'EOF'
import json, sys
d = json.loads(sys.argv[1])
mbps = d.get("median_mb_per_sec", 0.0)
med, sp = d.get("median_sec", 0.0), d.get("spread_sec", 1e9)
bad = mbps < 20.0 or sp > max(2 * med, 2.0)
print("RED" if bad else "GREEN", round(mbps, 1), "MB/s")
EOF
)
  echo "  arbiter: envelope $verdict"
  case "$verdict" in RED*) red=1;; esac
fi

if [ "$red" -ne 0 ]; then
  echo "BENCH GUARD RED: isolated measurement confirmed a flag — fix before shipping"
  exit 1
fi
echo "BENCH GUARD GREEN: all flagged queries cleared by isolated arbiter"
tools/src_hash.sh > .last_bench_guard_hash
