#!/usr/bin/env bash
# Same-session A/B bench: run the PREVIOUS round's commit and the current
# working tree back-to-back on the same box (two sbt runs, same machine
# state), so environmental drift vs code regression is decidable from
# artifacts instead of builder memory.
#
# Writes BENCH_PREV.json at the repo root with the previous commit's total;
# graft.Bench reads it (if present) and emits prev_commit/prev_commit_total
# in its JSON line, so the driver's BENCH_r{N}.json carries the A/B context.
#
# Usage: tools/bench_ab.sh [prev-commit]
#   prev-commit defaults to the most recent driver round-artifact commit
#   (message "round N: ...").
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
# default PREV: the newest 'round N' commit EXCLUDING HEAD — right after a
# round commit, HEAD itself matches the grep and would A/B against itself
PREV="${1:-$(git log --grep='^round ' --format=%H -n 20 | grep -v "^$(git rev-parse HEAD)$" | head -1)}"
if [ -z "$PREV" ]; then
  echo "no previous round commit found; pass one explicitly" >&2
  exit 1
fi

WT=/tmp/graft_prev_wt
git worktree remove --force "$WT" 2>/dev/null || true
# set -e: a mid-script failure must not leak the worktree
trap 'git worktree remove --force "$WT" 2>/dev/null || true' EXIT
git worktree add --detach "$WT" "$PREV" >/dev/null

echo "== bench @ previous commit $(git rev-parse --short "$PREV")"
PREV_LINE=$(cd "$WT" && SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch 'runMain graft.Bench' 2>&1 | grep -o '{"metric".*}' | tail -1)
echo "$PREV_LINE"
PREV_TOTAL=$(PREV_LINE="$PREV_LINE" python3 -c \
  'import json,os; print(json.loads(os.environ["PREV_LINE"])["value"])')

# keep the per-query map so like-for-like totals stay computable from the
# artifact when the query set grows between rounds
PREV_QUERIES=$(PREV_LINE="$PREV_LINE" python3 -c \
  'import json,os; print(json.dumps(json.loads(os.environ["PREV_LINE"])["queries"]))')
cat > BENCH_PREV.json <<EOF
{"commit":"$(git rev-parse --short "$PREV")","total":$PREV_TOTAL,"sf":"$SF_DIR","at":"$(date -u +%FT%TZ)","queries":$PREV_QUERIES}
EOF
echo "== BENCH_PREV.json: prev total ${PREV_TOTAL}s"

echo "== bench @ current working tree"
CUR_LINE=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch 'runMain graft.Bench' 2>&1 | grep -o '{"metric".*}' | tail -1)
echo "$CUR_LINE"
