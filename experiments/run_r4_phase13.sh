#!/bin/bash
# Round-4 phase-13 queue: quantify the EMA + self-ensemble additions
# (one EMA-enabled SwinIR-lite grains train, 2x2 eval matrix).


# Waits for phase 12.  Same discipline.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] phase13 waiting for phase12 ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "phase12 ALL DONE" "$LOG"; do sleep 60; done
echo "[queue] phase13 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/ema_tta_ab.py 10800 ema_tta_ab 2000 25
echo "[queue] phase13 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
