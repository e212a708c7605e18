#!/bin/bash
# Round-5 phase-19 (chained behind phase 18): the shifted-rect
# SHIFT_CHUNK=8 standalone retest that phase 15 never reached, then
# the decisive production-tile (192^2) fused-stack A/B without the
# measured-loss chan kernel.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log

until grep -q "r5-phase18 ALL DONE" "$LOG"; do
  sleep 60
done
echo "[queue] r5-phase19 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/fused_rect_diag.py 7200 fused_rect_diag4
run_one experiments/dat_fused_192_ab.py 10800 dat_fused_192_ab
echo "[queue] r5-phase19 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
