#!/bin/bash
# Round-4 phase-5 queue (session 5): land the conv-halo default flip
# and the remaining unmeasured flags, then the longer grains proofs:
#   1. halo_flip_validate — 256^2 whole-forward with the flipped
#      defaults: the strict _fit_rows gate must route every squeezed
#      conv back to XLA (no Mosaic crash, ~45-46.5 ms class)
#   2. bench — re-bank the headline with halo convs at the bench shape
#      (bench_shape_ab measured the real program 50.53 vs 51.79 ms)
#   3. swinir_train_absorb_ab — ABSORB_TRAIN rolls-vs-absorb on the
#      finetune workload (b8 64px x4, drop_path 0.1 and 0)
#   4-6. grains quality proofs, LONGER (the 300/200-epoch runs were
#      still climbing; --val_every cuts the 7.5x validation tax)
# Same discipline as run_all.sh: setsid launch, 3h timeouts, shared
# persistent compile cache, probe before every script, never kill
# mid-compile.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] phase5 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/halo_flip_validate.py    10800 halo_flip_validate
run_one bench.py                             10800 bench_r4_halo
run_one experiments/swinir_train_absorb_ab.py 10800 swinir_train_absorb_ab
PROOF_STYLE=grains run_one experiments/swinir_quality_proof.py 10800 swinir_grains_long 2000 25
PROOF_STYLE=grains run_one experiments/hat_quality_proof.py    10800 hat_grains_long 1200 10
PROOF_STYLE=grains run_one experiments/dat_quality_proof.py    10800 dat_grains_long 1200 10
echo "[queue] phase5 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
