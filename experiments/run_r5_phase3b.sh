#!/bin/bash
# Round-5 phase-3b: re-test the reworked fused-tail dwconv (Mosaic
# rejection fix), then the hat_fast grains proof; emits the
# r5-phase3 ALL DONE marker phase 4 waits on.  Waits for the orphaned
# hat_ws8_forward to finish (its own ALL DONE line).
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] r5-phase3b waiting for hat_ws8_forward ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "ALL DONE" experiments/logs/hat_ws8_forward.log 2>/dev/null; do sleep 30; done
echo "[queue] r5-phase3b start $(date -u +%FT%TZ)" >> "$LOG"

probe() {
  until timeout 300 python -c "import jax; jax.devices(); print('TPU_UP')" 2>/dev/null | grep -q TPU_UP; do
    echo "[queue] backend down, retry in 120s ($(date -u +%FT%TZ))" >> "$LOG"
    sleep 120
  done
  echo "[queue] backend UP ($(date -u +%FT%TZ))" >> "$LOG"
}

run_one() {
  local script=$1 tmo=$2 logname=$3; shift 3
  probe
  echo "[queue] run $logname ($(date -u +%FT%TZ))" >> "$LOG"
  timeout "$tmo" python -u "$script" "$@" > "experiments/logs/$logname.log" 2>&1
  echo "[queue] done $logname rc=$? ($(date -u +%FT%TZ))" >> "$LOG"
}

run_one experiments/fused_tail_diag.py 3600 fused_tail_diag2
PROOF_STYLE=grains PROOF_MODEL=hat_fast run_one experiments/hat_quality_proof.py 10800 hat_fast_grains 1200 10
echo "[queue] r5-phase3 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
