#!/bin/bash
# The min-of-4 isolated rerun protocol used for every cross-round bench
# adjudication (SCALE.md): 4 fresh JVMs, each warm+measure (reps=2,
# min), then the per-query min across runs. A cross-round delta is only
# believed after this number moves; for code-vs-host separation, run it
# again on the old commit in a scratch worktree (SCALE.md, r12).
#
# usage: scripts/isolated_bench.sh q21_scd_merge,q38_drill_quarter [sfdir]
set -euo pipefail
QUERIES=$1
SF=${2:-/root/testdata/sf0.1}
for i in 1 2 3 4; do
  SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_SF_DIR="$SF" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
done | python3 -c '
import json, sys
runs = [json.loads(l)["queries"] for l in sys.stdin]
calibs = "see per-run lines above"
for q in sorted(runs[0]):
    vals = [r[q] for r in runs]
    print(f"{q}: min={min(vals)}  runs={vals}")
'
