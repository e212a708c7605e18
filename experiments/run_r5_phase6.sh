#!/bin/bash
# Round-5 phase-6: (a) fused-kernel quality guard on the saved DAT X4
# checkpoint; (b) longer SwinIR X4 grains run (VERDICT r4 weak #3 —
# was the +2.19 dB margin a training-budget artifact?  4000 ep, val
# curve decides).  Waits for phase 5.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] r5-phase6 waiting for r5-phase5 ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "r5-phase5 ALL DONE" "$LOG"; do sleep 60; done
echo "[queue] r5-phase6 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/dat_fused_eval_check.py 7200 dat_fused_eval_check
PROOF_STYLE=grains PROOF_SCALE=X4 run_one experiments/swinir_quality_proof.py 10800 swinir_grains_x4_long 4000 50
echo "[queue] r5-phase6 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
