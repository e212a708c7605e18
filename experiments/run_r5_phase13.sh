#!/bin/bash
# Round-5 phase-13 v2 (chained behind phase 12): (a) in-model bisect of
# the 256^2 rect compile crash (call count vs shape, + channel-kernel
# in-model viability), (b) shifted-rect standalone retest with
# SHIFT_CHUNK, (c) the fused-channel-attention A/B.
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

run_one experiments/dat_rect_inmodel_diag.py 10800 dat_rect_inmodel_diag
run_one experiments/dat_fused_chan_ab.py 10800 dat_fused_chan_ab
run_one experiments/dat_fused_chan_ab.py 10800 dat_fused_chan_ab_192 192
run_one experiments/fused_rect_diag.py 7200 fused_rect_diag4
echo "[queue] r5-phase13 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
