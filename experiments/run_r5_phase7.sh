#!/bin/bash
# Round-5 phase-7: group8 dwconv + split-shifted rect kernel
# revalidation at 256^2, then the fused tail(+rect) whole-model A/B.
# Waits for phase 6 (swinir X4 long).
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] r5-phase7 waiting for r5-phase6 ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "r5-phase6 ALL DONE" "$LOG"; do sleep 60; done
echo "[queue] r5-phase7 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/fused_tail_diag.py 3600 fused_tail_diag4
run_one experiments/fused_rect_diag.py 3600 fused_rect_diag2
run_one experiments/dat_fused_tail_ab.py 10800 dat_fused_tail_ab3
echo "[queue] r5-phase7 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
