#!/bin/bash
# Round-3 queue c: the one untried inference lever from DESIGN.md 6g —
# larger batch. Inference holds no backward activations, so batches well
# past the training OOM points should fit; bigger B fills more sublanes in
# the low-channel early backbone stages and amortises dispatch overhead.
#   a. D4@1024 b128 (current record 208.7 img/s at b64)
#   b. D0@512  b256 (current record 2353 img/s at b128)
#   c. D7@1536 b16  (current record 51.95 img/s at b8)
# One compile each; an OOM is itself the answer (record it).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/onchip_r3c}
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

run_step d4_b128_infer 2400 python bench.py --phi 4 --batch 128 --skip-parity
run_step d0_b256_infer 1800 python bench.py --phi 0 --batch 256 --skip-parity
run_step d7_b16_infer  3000 python bench.py --phi 7 --batch 16 --skip-parity

echo "queue r3c done; summary:"
grep -h -e '"metric"' "$LOG"/*.log 2>/dev/null | tail -10
