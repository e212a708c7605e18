#!/bin/bash
# Round-5 phase-3 queue: hat_fast preset — 256^2 forward A/B (ws=8 vs
# ws=7) + a grains proof run routed through the preset by name
# (VERDICT r4 next-step #5).  Waits for phase 2 (EMA/TTA).
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] r5-phase3 waiting for r5-phase2 ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "r5-phase2 ALL DONE" "$LOG"; do sleep 60; done
echo "[queue] r5-phase3 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/hat_ws8_forward.py 10800 hat_ws8_forward
PROOF_STYLE=grains PROOF_MODEL=hat_fast run_one experiments/hat_quality_proof.py 10800 hat_fast_grains 1200 10
echo "[queue] r5-phase3 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
