#!/bin/bash
# Round-4 phase-7 queue: SwinIR train-step conv-impl A/B
# (xla vs halo/gemm-bwd vs halo/xla-bwd) — did the halo flip regress
# the training path (round-2 63.2 ms vs post-flip ~73-75 ms, or is
# that cross-day tunnel variance)?  Waits for phase 6 (one TPU process
# at a time).  Same discipline: setsid launch, 3h timeout, shared
# persistent compile cache, probe first, never kill mid-compile.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] phase7 waiting for phase6 ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "phase6 ALL DONE" "$LOG"; do sleep 60; done
echo "[queue] phase7 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/swinir_train_conv_ab.py 10800 swinir_train_conv_ab
echo "[queue] phase7 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
