#!/bin/bash
# Hardware re-capture runbook. STATUS: fully executed in round 5
# (2026-08-19) — every step's number is recorded in docs/performance.md
# ("Round-5" section). Keep for re-use: run the moment a live TPU tunnel
# session starts after any engine/kernel change. Priority-ordered so an
# early tunnel death still leaves the highest-value numbers captured.
# Each step appends its ONE-line JSON to /tmp/hw_capture.jsonl.
#
#   bash experiments/hw_capture.sh
#
# Same-session discipline: every A/B inside a step is same-process; numbers
# across steps share the session but NOT the process (docs/performance.md
# "Measurement discipline").
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hw_capture.jsonl
: > "$OUT"

step() {
  local name="$1"; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT.log"
  local tmp rc
  tmp=$(mktemp)
  timeout 1800 "$@" > "$tmp" 2>>"$OUT.log"; rc=$?
  cat "$tmp" >> "$OUT.log"
  if grep -qE '^\{' "$tmp"; then
    grep -E '^\{' "$tmp" | while read -r line; do
      echo "{\"step\": \"$name\", \"rc\": $rc, \"out\": $line}" >> "$OUT"
    done
  else
    echo "{\"step\": \"$name\", \"rc\": $rc, \"out\": null}" >> "$OUT"
  fi
  rm -f "$tmp"
  echo "=== $name done rc=$rc ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT.log"
}

# 1. Headline with the r5 kernel (gated extraction + count floor): the
#    scoreboard row, and the Mosaic compile + on-device recall gate for
#    the productized kexp18 change.
step headline python bench.py
# 2. Serving stack on TPU (VERDICT item 2 — two rounds queued): binary
#    protocol + quiescent batching, then the bulk-retrieval wire path.
step serve python bench.py --workload serve
step serve-batch python bench.py --workload serve-batch
# 3. Config 3 (top-100) with the r5 kernel.
step config3-b256 python bench.py --k 100
step config3-b512 python bench.py --k 100 --batch 512
# 4. Config 2 (l2 + dot) with the r5 kernel (VERDICT item 8).
step config2-l2 python bench.py --metric l2
step config2-dot python bench.py --metric dot
# 5. Engine-level same-session A/B legs: pre-r5 extraction (kill switch)
#    and the approx floor control — two processes, same session.
step headline-ungated env VROD_GATED_EXTRACT=0 python bench.py
step config3-ungated env VROD_GATED_EXTRACT=0 python bench.py --k 100
step headline-approx env VROD_THETA0_METHOD=approx python bench.py
# 6. Config 4 (mixed insert/delete/search).
step mixed python bench.py --workload mixed
# 7. Config 1 (100k x 128) + batch-1 latency point.
step config1 python bench.py --rows 100000 --dim 128 --batch 1 --k 10
# 8. Capacity points: 10M x 768 int8 top-16 + top-100 (long; last).
step cap10m-k16 python bench.py --rows 10485760
step cap10m-k100 python bench.py --rows 10485760 --k 100

echo "ALL DONE $(date -u +%H:%M:%S)"; cat "$OUT"
