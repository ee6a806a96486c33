#!/bin/bash
# Refuses (exit 1) if src/ or build.sbt changed since the last green sweep
# (tools/sweep.sh). Run before any commit that is supposed to be
# artifact-only — e.g. the end-of-round snapshot. Exit 0 = the working
# tree's behavior-bearing source is byte-identical to what the last green
# sweep certified, so committing artifacts cannot smuggle un-swept code.
set -euo pipefail
cd "$(dirname "$0")/.."
if [ ! -f .last_sweep_src_hash ]; then
  echo "SNAPSHOT GUARD: no recorded sweep (.last_sweep_src_hash missing) — run tools/sweep.sh" >&2
  exit 1
fi
want=$(cat .last_sweep_src_hash)
have=$(tools/src_hash.sh)
if [ "$want" != "$have" ]; then
  echo "SNAPSHOT GUARD: src changed since last green sweep ($want -> $have)" >&2
  echo "Run tools/sweep.sh before snapshotting, or revert the source change." >&2
  exit 1
fi
echo "SNAPSHOT GUARD OK: src matches last green sweep ($want)"
