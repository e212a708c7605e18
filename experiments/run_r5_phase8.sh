#!/bin/bash
# Round-5 phase-8: +TTA column for the X4 grains table (eval-only
# re-runs of all persisted X4 proof checkpoints with --self_ensemble),
# including the phase-6 SwinIR 4000-ep long run.  Waits for phase 7.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] r5-phase8 waiting for r5-phase7 ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "r5-phase7 ALL DONE" "$LOG"; do sleep 60; done
echo "[queue] r5-phase8 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/tta_x4_eval.py 14400 tta_x4_eval
echo "[queue] r5-phase8 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
