#!/bin/bash
# Round-4 phase-11 queue: longer CNN grains proofs (MS_ResUNet was
# still climbing at 600 ep; UNet2D adds the last model-family row)


# Waits for phase 9.  Same discipline.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] phase11 waiting for phase10 ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "phase10 ALL DONE" "$LOG"; do sleep 60; done
echo "[queue] phase11 start $(date -u +%FT%TZ)" >> "$LOG"

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

PROOF_STYLE=grains run_one experiments/msresunet_quality_proof.py 10800 msresunet_grains_long 2500 25
PROOF_STYLE=grains run_one experiments/unet2d_quality_proof.py 10800 unet2d_grains 2000 25
echo "[queue] phase11 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
