#!/bin/bash
# Round-5 phase-16 (chained behind phase 15): the blockdiag-XLA
# channel-attention A/B + the direct rect-only 256^2 retry.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log

until grep -q "r5-phase16 ALL DONE" "$LOG"; do
  sleep 60
done
echo "[queue] r5-phase17 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/dat_chan_blockdiag_ab.py 10800 dat_chan_blockdiag_ab_192 192
echo "[queue] r5-phase17 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
