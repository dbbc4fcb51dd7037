#!/bin/bash
# Same-window A/B adjudication of one bench query against an older code
# boundary — the scripted form of the protocol that settled seven
# flagged sub-second ratios across rounds 13-14 (SCALING.md). When a
# merged per-query ratio vs a prior round looks like a regression, the
# question is "code or environment?": this script answers it in minutes
# by interleaving fresh-JVM runs of the SAME query from HEAD's classes
# and from a worktree compiled at <ref>, in one host window, so host
# drift cancels and only the code difference remains.
#
# Usage: tools/abcompare.sh <query> <ref> [pairs=4] [sfdir=/root/testdata/sf0.1]
#
#   query  a SparkEntry.queries key (must exist at BOTH commits)
#   ref    the old code boundary (commit/tag) to compare against
#   pairs  interleaved A/B pairs; run order flips each pair (ABBA...)
#          so slow-drift within the window biases neither side
#
# Prints one JSON line:
#   {"probe":"abcompare","query":...,"ref":...,"new_runs":[...],
#    "old_runs":[...],"min_new":x,"min_old":y,"ratio_new_over_old":r}
# Adjudication rule (SCALING.md): ratio within ~1.05 at min-of-pairs =>
# environmental, not code; re-run with more pairs before concluding a
# real regression on a sub-2 s query.
#
# Each run is a fresh JVM via the same flags as tools/bench_run.sh
# (SPARK_GRAFT_BENCH_ONLY selects the query), so the measurement JVM is
# identical to the committed merge protocol's. Quiet-window rules apply:
# no sbt/Spark work alongside, idle the host after the worktree compile
# before the first timed pair.
set -euo pipefail

QUERY="${1:?usage: abcompare.sh <query> <ref> [pairs] [sfdir]}"
REF="${2:?usage: abcompare.sh <query> <ref> [pairs] [sfdir]}"
PAIRS="${3:-4}"
SFDIR="${4:-/root/testdata/sf0.1}"

REPO=/root/repo
SHORT=$(git -C "$REPO" rev-parse --short "$REF")
WT="/tmp/graft_ab_$SHORT"
SCRATCH=$(mktemp -d /tmp/graft_abcompare.XXXXXX)

# worktree + compile at the old boundary (reused across invocations —
# the compile is the expensive half, ~2 min; the worktree is inert
# afterwards and `git worktree remove` reclaims it)
if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$REF" >&2
fi
if [ ! -d "$WT/target/scala-2.13/classes/graft" ]; then
  (cd "$WT" && sbt -batch compile >&2)
fi

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_one() { # $1 = classes dir, $2 = out json
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_SF_DIR="$SFDIR" \
  SPARK_GRAFT_BENCH_ONLY="$QUERY" \
  SPARK_GRAFT_BENCH_OUT="$2" \
  java $ADD_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -cp "$1:/opt/spark/jars/*" graft.Bench \
    > "${2%.json}.stdout.log" 2> "${2%.json}.stderr.log"
  python3 -c "import json,sys; print(json.load(open('$2'))['queries']['$QUERY'])"
}

NEW_CP="$REPO/target/scala-2.13/classes"
OLD_CP="$WT/target/scala-2.13/classes"
new_runs=() ; old_runs=()
for i in $(seq 1 "$PAIRS"); do
  if [ $((i % 2)) -eq 1 ]; then
    new_runs+=("$(run_one "$NEW_CP" "$SCRATCH/new_$i.json")")
    old_runs+=("$(run_one "$OLD_CP" "$SCRATCH/old_$i.json")")
  else
    old_runs+=("$(run_one "$OLD_CP" "$SCRATCH/old_$i.json")")
    new_runs+=("$(run_one "$NEW_CP" "$SCRATCH/new_$i.json")")
  fi
  echo "[abcompare] pair $i/$PAIRS: new=${new_runs[-1]} old=${old_runs[-1]}" >&2
done

python3 - "$QUERY" "$SHORT" "${new_runs[*]}" "${old_runs[*]}" <<'EOF'
import json, sys
q, ref = sys.argv[1], sys.argv[2]
new = [float(x) for x in sys.argv[3].split()]
old = [float(x) for x in sys.argv[4].split()]
r = min(new) / min(old) if min(old) > 0 else float('nan')
print(json.dumps({"probe": "abcompare", "query": q, "ref": ref,
                  "new_runs": new, "old_runs": old,
                  "min_new": min(new), "min_old": min(old),
                  "ratio_new_over_old": round(r, 3)},
                 separators=(',', ':')))
EOF
rm -rf "$SCRATCH"
