#!/usr/bin/env bash
# End-of-round artifact regeneration: interleaved A/B, 1x/10x/skew scale
# runs over ALL heavies, 100x flagships, assembled into BENCH_r9_sf1.json
# / BENCH_r9_sf10.json. Run on a QUIET box (no concurrent Spark/DuckDB) —
# contended timings corrupt the linearity ratios.
#
# Usage: tools/final_artifacts.sh <round-tag e.g. r09>
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:?round tag, e.g. r09}"
SF=/root/testdata/sf0.1

# 1x baseline over every heavy (fresh workdir: copies=1)
sbt -batch "runMain graft.ScaleBench $SF /tmp/graft_c1 1" 2>&1 \
  | grep -o '{"metric".*}' | tail -1 > /tmp/sc_c1.json
# 10x uniform
sbt -batch "runMain graft.ScaleBench $SF /tmp/graft_sf1 10" 2>&1 \
  | grep -o '{"metric".*}' | tail -1 > /tmp/sc_c10.json
# 10x skewed universe (hot shard / heavy-hitter keys)
sbt -batch "runMain graft.ScaleBench $SF /tmp/graft_skew 10 --skew" 2>&1 \
  | grep -o '{"metric".*}' | tail -1 > /tmp/sc_skew.json

python3 tools/assemble_scale.py sf1 /tmp/sc_c1.json /tmp/sc_c10.json \
  /tmp/sc_skew.json "BENCH_${TAG}_sf1.json" \
  "graft.ScaleBench - sf0.1 replicated 10x (disjoint affine-cipher text shards / sign-flip embedding isometries / per-copy-suffixed linkage blocks); every ScaleBench heavy" \
  "skewed replication: one content shard copies-x hot, ~half of events on one event_type and one user"

# staleness guard (the round-8 AND round-10 mistake): every ScaleBench
# heavy must have an entry in the artifact just written — a missing key
# means the artifact was generated from a stale build or the compile
# above didn't pick up the newest wave. Fail loudly instead of shipping
# partial scale evidence.
# (round 16: run/outputStrategy=StdoutOutput strips the child's
# "[info] " prefix, so accept both the bare and the prefixed form; the
# trailing `|| true` keeps pipefail quiet when grep filters everything)
sbt -batch "runMain graft.ScaleBench --list-heavies" 2>/dev/null \
  | sed -n 's/^\(\[info\] \)\{0,1\}\([a-z0-9_][a-z0-9_]*\)$/\2/p' \
  | { grep -v '^running$' || true; } | sort > /tmp/heavies.txt
if [ ! -s /tmp/heavies.txt ]; then
  echo "STALE GUARD BROKEN: --list-heavies produced no names" >&2
  exit 1
fi
python3 - "BENCH_${TAG}_sf1.json" /tmp/heavies.txt <<'PYEOF'
import json, sys
art = set(json.load(open(sys.argv[1]))["queries"])
heavies = set(open(sys.argv[2]).read().split())
missing = sorted(heavies - art)
if missing:
    sys.exit(f"STALE ARTIFACT: heavies missing from {sys.argv[1]}: {missing}")
print(f"staleness guard OK: all {len(heavies)} heavies present")
PYEOF

# 100x flagships: the eight prior flagships + the lossless prefix-filter
# join, the composed entity resolution, (round 11) the two priciest
# summary-window stats — Kaplan-Meier and Spearman — (round 13, per
# the round-12 verdict) the two priciest adtl-core gates plus both table
# profiles: the exact Expand audit and its no-Expand HLL twin — and
# (round 14, per the round-13 verdict) the two formerly-superlinear
# heavies, now riding the inverted-index COUNT join (blockedPairCounts):
# containment and the dedup data card
FLAGS="d_lsh_jaccard_verify s_ivf_topk t_winnow_overlap s_ivfpq_topk \
q_training_mix q_quality_pipeline q_apply_changes s_knn_graph \
d_prefix_jaccard q_entity_resolution q_kaplan_meier q_spearman \
q_profile_table q_profile_table_approx adtl_groupby_combined \
d_containment q_dedup_report"
sbt -batch "runMain graft.ScaleBench $SF /tmp/graft_f1 1 $FLAGS" 2>&1 \
  | grep -o '{"metric".*}' | tail -1 > /tmp/sc_f1.json
sbt -batch "runMain graft.ScaleBench $SF /tmp/graft_sf10 100 $FLAGS" 2>&1 \
  | grep -o '{"metric".*}' | tail -1 > /tmp/sc_f100.json

python3 tools/assemble_scale.py sf10 /tmp/sc_f1.json /tmp/sc_f100.json \
  "BENCH_${TAG}_sf10.json" \
  "graft.ScaleBench - sf0.1 replicated 100x, seventeen flagships: the fifteen prior plus the two formerly-superlinear heavies, both riding the inverted-index count join (containment, dedup data card)"

echo "== artifacts written: BENCH_${TAG}_sf1.json BENCH_${TAG}_sf10.json"
