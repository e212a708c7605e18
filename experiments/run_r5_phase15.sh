#!/bin/bash
# Round-5 phase-15: the in-model compile crash turns out to be the
# axon TpuAotCompiler (chipless) path failing env detection ("could
# not determine TPU accelerator type, please set env var
# TPU_ACCELERATOR_TYPE manually" -> hostname parse cascade,
# dat_fused_tail_ab4 2026-08-20).  Re-run the decisive A/Bs with the
# suggested env vars set client-side (the terminal adopts the client
# compile env for some flags — worth one cheap test each).
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export TPU_ACCELERATOR_TYPE=v5litepod-1
export TPU_WORKER_HOSTNAMES=localhost
export TPU_WORKER_ID=0
LOG=experiments/logs/queue.log

until grep -q "ALL DONE" experiments/logs/dat_rect_inmodel_diag.log 2>/dev/null; do
  sleep 60
done
echo "[queue] r5-phase15 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/dat_fused_rect_ab.py 10800 dat_fused_rect_ab3
run_one experiments/dat_fused_chan_ab.py 10800 dat_fused_chan_ab
run_one experiments/dat_fused_chan_ab.py 10800 dat_fused_chan_ab_192 192
run_one experiments/fused_rect_diag.py 7200 fused_rect_diag4
echo "[queue] r5-phase15 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
