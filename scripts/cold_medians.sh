#!/bin/bash
# n=3 COLD runs (fresh process + fresh Spark session each) of the heavy
# contract queries tracked in judge_times.md — medians settle what single
# runs can't on a host with >30% spread (r4 VERDICT item 1).
# Usage: scripts/cold_medians.sh [n] [query ...]   (default n=3, all six
# tracked queries; queries run serially, never concurrently with any
# other Spark job)
set -u
N=${1:-3}
shift $(( $# > 0 ? 1 : 0 ))
QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(
    leiden_copurchase_sparse
    leiden_invariants_copurchase
    spectral_invariants_copurchase
    ecg_invariants_copurchase
    louvain_invariants_copurchase
    hungarian_auction_supp_part
  )
fi
cd "$(dirname "$0")/.."
for q in "${QUERIES[@]}"; do
  for i in $(seq 1 "$N"); do
    # the bracketed per-query figure excludes session startup
    out=$(timeout 600 python scripts/check_contract.py "$q" 2>/dev/null | grep -oE "(PASS|ok\?|FAIL) +$q.*")
    echo "$q run$i: $out"
  done
done
