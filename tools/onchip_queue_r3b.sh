#!/bin/bash
# Round-3 follow-up on-chip queue: explain the b128 train regression.
#
# The round-2 record was 524 img/s/chip (D0@512 b128 bf16). This round's
# train_b128_fused measured 497 — a ~5% REGRESSION where the fused
# (optax.flatten) optimizer was expected to land ~575 (docs/DESIGN.md 6f).
# Inference the same hour matched its record to 0.3%, so this is not relay
# drift. Two changes landed between the record and the measurement:
#   c432d2c  fused (flattened) optimizer   (expected +)
#   dc6aa84  batch-global loss normalization
# A/B matrix (one compile each):
#   a. b128 bf16 --no-fused-optimizer  -> isolates the optimizer change
#   b. b128 bf16 fused + --trace       -> decompose where the ms went
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/onchip_r3b}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site

run_step() {  # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  if [ -f "$LOG/$name.ok" ]; then echo "== $name: already done, skip"; return 0; fi
  echo "== $name: start $(date +%H:%M:%S) -> $LOG/$name.log"
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$LOG/$name.ok"; echo "== $name: OK"; else
    echo "== $name: FAILED rc=$rc (see $LOG/$name.log)"; fi
  return $rc
}

# (Flag updated round 4: leaf-wise is now bench_train's default — fused
# became the opt-in --fused-optimizer after the A/B below measured it 5%
# slower; this step is the default configuration, kept for re-runs.)
run_step train_b128_nofused 2400 python tools/bench_train.py --batch 128 \
  --dtype bf16
# b160 with remat_max_stage=3 OOM'd by just 56M (15.80/15.75G hbm);
# remat stage 4 as well to free its saved activations and retry.
run_step train_b160_sel4 2400 python tools/bench_train.py --batch 160 \
  --dtype bf16 --remat --remat-max-stage 4
run_step train_b128_fused_trace 2400 python tools/bench_train.py --batch 128 \
  --dtype bf16 --fused-optimizer --trace "$LOG/b128_fused_trace"

[ -d "$LOG/b128_fused_trace" ] && python tools/analyze_trace.py \
  "$LOG/b128_fused_trace" --json >"$LOG/b128_fused_trace.roofline.txt" 2>&1 \
  && echo "== b128 trace analysis -> $LOG/b128_fused_trace.roofline.txt"

echo "queue r3b done; summary:"
grep -h -e '"metric"' "$LOG"/*.log 2>/dev/null | tail -10
