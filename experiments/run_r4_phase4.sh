#!/bin/bash
# Round-4 phase-4 queue (session 4): follow-ups born from the phase-3
# results + the fixes committed in d8c4086:
#   1. conv_halo_flip_ab  — trunk/input/upsample halo convs with
#      VMEM-sized rows at 256^2 AND bench shape -> CONV3X3_IMPL flip
#      decision (chasing the 22.3 MPix/s VERDICT target)
#   2. hat_train_split    — re-run with the PACKED_GROUP_BWD VMEM fix
#      (phase-2 run crashed before the fix landed)
#   3. swinir grains proof — re-run with the numpy-params fix (the
#      phase-2 run crashed in _prep_weights on numpy.ndarray.at)
# Same discipline as run_all.sh: setsid launch, 3h timeouts, shared
# persistent compile cache, probe before every script, never kill
# mid-compile.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] phase4 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/conv_halo_flip_ab.py 10800 conv_halo_flip_ab
run_one experiments/hat_train_split.py   10800 hat_train_split2
PROOF_STYLE=grains run_one experiments/swinir_quality_proof.py 10800 swinir_quality_proof_grains2
echo "[queue] phase4 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
