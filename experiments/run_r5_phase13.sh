#!/bin/bash
# Round-5 phase-13 (chained behind phase 12): (a) shifted-rect retest
# with SHIFT_CHUNK window chunking (bounds the score-sized temps the
# diag3 failures point at), (b) the fused-channel-attention A/B —
# the two-phase XCiT gram kernel, alone and stacked.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log

until grep -q "r5-phase12 ALL DONE" "$LOG"; do
  sleep 60
done
echo "[queue] r5-phase13 start $(date -u +%FT%TZ)" >> "$LOG"

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
run_one experiments/dat_fused_chan_ab.py 10800 dat_fused_chan_ab
echo "[queue] r5-phase13 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
