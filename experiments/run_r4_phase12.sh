#!/bin/bash
# Round-4 phase-12 queue: X4 grains quality proofs (BASELINE.md anchors
# X2 AND X4 — MS_ResUNet 33.10 dB X4 vs 31.42 bicubic on the real set;
# all recorded proofs so far are X2).  PROOF_SCALE=X4 grows HR images
# to 192^2 so native-LR patches (LR 48^2) still fit.


# Waits for phase 11.  Same discipline.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] phase12 waiting for phase11 ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "phase11 ALL DONE" "$LOG"; do sleep 60; done
echo "[queue] phase12 start $(date -u +%FT%TZ)" >> "$LOG"

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
run_one experiments/msresunet_quality_proof.py 10800 msresunet_grains_x4 2500 25
run_one experiments/swinir_quality_proof.py 10800 swinir_grains_x4 2000 25
run_one experiments/hat_quality_proof.py 10800 hat_grains_x4 1200 10
run_one experiments/dat_quality_proof.py 10800 dat_grains_x4 1200 10
echo "[queue] phase12 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
