#!/bin/bash
# Round-5 phase-14 (chained behind phase 13): refresh the DAT X4
# grains checkpoint (round-4's lived in /tmp and is gone), then the
# fused-kernel dB-transparency guard over the full kernel stack
# (module / chan / chan+rect / +shift / +tail).
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log

until grep -q "r5-phase15 ALL DONE" "$LOG"; do
  sleep 60
done
echo "[queue] r5-phase14 start $(date -u +%FT%TZ)" >> "$LOG"

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

export PROOF_STYLE=grains PROOF_SCALE=X4
run_one experiments/dat_quality_proof.py 10800 dat_grains_x4_r5 1200 10
run_one experiments/dat_fused_eval_check.py 10800 dat_fused_eval_check2
echo "[queue] r5-phase14 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
