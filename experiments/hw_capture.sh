#!/bin/bash
# Hardware re-capture runbook (VERDICT r3 items 1-2 + kernel queue): run the
# moment a live TPU tunnel session starts. Priority-ordered so an early
# tunnel death still leaves the highest-value numbers captured. Each step
# appends its ONE-line JSON to /tmp/hw_capture.jsonl and echoes progress.
#
#   PYTHONPATH=/root/.axon_site bash experiments/hw_capture.sh
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
  timeout 1200 "$@" > "$tmp" 2>>"$OUT.log"; rc=$?
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

# 1. Headline (int8 cosine top-16 batch-256, 1M x 768) — the scoreboard row.
step headline python bench.py
# 2. Config 3 (top-100), batch 256 and 512.
step config3-b256 python bench.py --k 100
step config3-b512 python bench.py --k 100 --batch 512
# 3. Config 2 (l2 + dot, 256-query batches).
step config2-l2 python bench.py --metric l2
step config2-dot python bench.py --metric dot
# 4. Serving stack on TPU (binary protocol + quiescent batching) — never
#    yet measured on hardware with the round-3 host-path rebuild.
step serve python bench.py --workload serve
step serve-batch python bench.py --workload serve-batch
# 5. Config 4 (mixed insert/delete/search).
step mixed python bench.py --workload mixed
# 6. Kernel experiments (VERDICT item 4): fused theta0 pre-pass,
#    pl.when-gated extraction, and the counting floor threshold —
#    same-process A/Bs, bit-exactness asserted / recall-probed.
step kexp19 python experiments/kexp19.py
step kexp17 python experiments/kexp17.py
step kexp18 python experiments/kexp18.py
# 7. Config 1 (100k x 128, single query) + batch-1 latency point.
step config1 python bench.py --rows 100000 --dim 128 --batch 1 --k 10
# 8. Capacity point: 10M x 768 int8 top-16 + top-100 (long; last).
step cap10m-k16 python bench.py --rows 10485760
step cap10m-k100 python bench.py --rows 10485760 --k 100

echo "ALL DONE $(date -u +%H:%M:%S)"; cat "$OUT"
