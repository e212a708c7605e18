#!/bin/bash
# Round-4 phase-2 queue: runs AFTER run_all.sh drains the round-3
# backlog.  New A/Bs from this round (DAT bf16 softmax maps, SwinIR
# train-step conv impls) + quality proofs on the discriminative
# 'grains' synthetic set.  Same probe/timeout discipline as run_all.sh.
set -u
cd /root/repo
mkdir -p experiments/logs
LOG=experiments/logs/queue.log
echo "[queue] phase2 start $(date -u +%FT%TZ)" >> "$LOG"

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

# (The new A/Bs were folded into run_all.sh round-4: dat_bf16_maps_ab
# became dat_impl_matrix's softmax=bf16 case, swinir_train_ab runs in
# the train-step block.)  Phase 2 = quality proofs on the grains set
# (sharp edges, 28.5 dB bicubic floor — discriminative, VERDICT weak #5).
export PROOF_STYLE=grains
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
run_one experiments/swinir_quality_proof.py 10800 swinir_quality_proof_grains
run_one experiments/hat_quality_proof.py    10800 hat_quality_proof_grains 300
run_one experiments/dat_quality_proof.py    10800 dat_quality_proof_grains 200
echo "[queue] phase2 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
