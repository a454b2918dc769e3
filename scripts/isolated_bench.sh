#!/bin/bash
# The min-of-4 isolated rerun protocol used for every cross-round bench
# adjudication (SCALE.md): 4 fresh JVMs, each warm+measure (reps=2,
# min), then the per-query min across runs. A cross-round delta is only
# believed after this number moves; for code-vs-host separation, run it
# again on the old commit in a scratch worktree (SCALE.md, r12).
#
# Emits a JSON artifact (VERDICT r12 §next-6) so each round's drift
# adjudication is a diff of two committed files, not a prose claim —
# commit it as BENCH_isolated_r{N}.json.
#
# usage: scripts/isolated_bench.sh q21_scd_merge,q38_drill_quarter \
#          [sfdir] [out.json]
#
# Drift mode (VERDICT r13 §next-6 — the protocol must emit its own
# work-list so no >0.5 s cross-round delta can be skipped):
#   scripts/isolated_bench.sh --drift BENCH_full_rOLD.json \
#          BENCH_full_rNEW.json [sfdir] [out.json] [threshold_sec]
# computes every query whose committed per-query time moved more than
# the threshold between the two maps and runs the protocol on exactly
# that list.
set -euo pipefail
if [ "${1:-}" == "--drift" ]; then
  OLDMAP=$2; NEWMAP=$3
  SF=${4:-/root/testdata/sf0.1}
  OUT=${5:-bench_isolated.json}
  THRESH=${6:-0.5}
  QUERIES=$(python3 -c '
import json, sys
old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
th = float(sys.argv[3])
drift = sorted(q for q in new if q in old and abs(new[q] - old[q]) > th)
print(",".join(drift))
' "$OLDMAP" "$NEWMAP" "$THRESH")
  if [ -z "$QUERIES" ]; then
    echo "no drifts > ${THRESH}s between $OLDMAP and $NEWMAP"
    exit 0
  fi
  echo "adjudicating drifts > ${THRESH}s: $QUERIES"
else
  QUERIES=$1
  SF=${2:-/root/testdata/sf0.1}
  OUT=${3:-bench_isolated.json}
fi
for i in 1 2 3 4; do
  SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_SF_DIR="$SF" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
done | python3 -c '
import json, sys
out, sf = sys.argv[1], sys.argv[2]
lines = [json.loads(l) for l in sys.stdin]
runs = [l["queries"] for l in lines]
doc = {
    "protocol": "min-of-4 isolated JVMs, reps=2 min each",
    "sf_dir": sf,
    "calib_sec": [l.get("calib_sec") for l in lines],
    "queries": {
        q: {"min": min(r[q] for r in runs),
            "runs": [r[q] for r in runs]}
        for q in sorted(runs[0])
    },
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=True)
    f.write("\n")
for q, v in doc["queries"].items():
    mn, rs = v["min"], v["runs"]
    print(f"{q}: min={mn}  runs={rs}")
calibs = doc["calib_sec"]
print(f"wrote {out} (calibs {calibs})")
' "$OUT" "$SF"
