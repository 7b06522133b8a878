#!/bin/bash
# Round-3 on-chip work queue (VERDICT r2 next #2-#5), batched so a single
# relay-healthy window executes everything with ONE compile per experiment
# (axon-workflow rule: compiles on a loaded relay can take 15-25 min; a
# server-side compile cache makes identical re-runs fast).
#
# Usage:  bash tools/onchip_queue.sh [LOGDIR]          (default /tmp/onchip_r3)
# Safe to re-run: finished steps are skipped via sentinel .ok files.
# Each step is independently timeout-bounded; logs are full files, never
# piped through tail (OOM tracebacks must survive).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/onchip_r3}
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

# 1. Full driver metric set (kernel parity, D0 mfu+throughput, D4@1024).
run_step bench_full 2400 python bench.py

# 2. Fast-vs-exact eval AP delta on the chip (approx_max_k is exact on CPU,
#    so this number only means something here) — plain and adversarial.
run_step approx_delta 2400 python tools/eval_approx_delta.py
run_step approx_delta_adv 2400 python tools/eval_approx_delta.py --adversarial

# 3. Staged experiments (one compile each):
#    a. fused (flattened) optimizer at the b128 record config — the round-2
#       trace showed leaf-wise Adam costing 26 ms of the 243 ms step;
#       expectation: ~524 -> ~575 img/s/chip if the trace holds.
run_step train_b128_fused 2400 python tools/bench_train.py --batch 128 \
  --dtype bf16
#    b. D0 train b160 with stage-selective remat vs the 524 img/s b128
#       record (ROADMAP #3).
run_step train_b160_sel 2400 python tools/bench_train.py --batch 160 \
  --dtype bf16 --remat --remat-max-stage 3

# 4. D4 (and D7) INFERENCE roofline traces for the 6d-style audit.
run_step d4_infer_trace 2400 python bench.py --phi 4 --batch 64 \
  --skip-parity --trace "$LOG/d4_infer_trace"
run_step d7_infer_trace 3000 python bench.py --phi 7 --batch 8 \
  --skip-parity --trace "$LOG/d7_infer_trace"

# 5. Offline decomposition of the fresh traces (no TPU needed).
for t in d4_infer_trace d7_infer_trace; do
  [ -d "$LOG/$t" ] && python tools/analyze_trace.py "$LOG/$t" --json \
    >"$LOG/$t.roofline.txt" 2>&1 && echo "== $t roofline -> $LOG/$t.roofline.txt"
done

echo "queue done; summary:"
grep -h -e '"metric"' -e '"event"' -e img_s -e delta "$LOG"/*.log 2>/dev/null | tail -30
