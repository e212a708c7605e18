#!/bin/bash
# THE single on-chip measurement queue (consolidates the earlier
# ab_chain.sh / run_queue.sh runners, which raced for the one TPU).
# Probes the axon backend until it answers, then runs every queued
# experiment in value order, each logged to experiments/logs/.
# Safe across backend outages: each script is timeout-bounded, failures
# don't stop the chain, and the probe re-runs before every script.
#
# Round-4 hardening (learned 2026-08-19):
# - compiles over the tunnel measured ~23 min for a whole-HAT graph
#   (4-5x the round-3 rate) -> per-script timeouts raised to 3h and the
#   persistent compilation cache is exported for every child so a
#   killed/retried script never pays the same compile twice;
# - launch this script with `setsid` so an interactive session's
#   process-group teardown cannot SIGKILL a python mid-compile (that
#   wedges the remote compile service for many minutes).
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] run_all start $(date -u +%FT%TZ)" >> "$LOG"

probe() {
  until timeout 300 python -c "import jax; jax.devices(); print('TPU_UP')" 2>/dev/null | grep -q TPU_UP; do
    echo "[queue] backend down, retry in 120s ($(date -u +%FT%TZ))" >> "$LOG"
    sleep 120
  done
  echo "[queue] backend UP ($(date -u +%FT%TZ))" >> "$LOG"
}

run_one() {
  local script=$1 tmo=$2; shift 2
  local name=$(basename "$script" .py)
  probe
  echo "[queue] run $name ($(date -u +%FT%TZ))" >> "$LOG"
  timeout "$tmo" python -u "$script" "$@" > "experiments/logs/$name.log" 2>&1
  echo "[queue] done $name rc=$? ($(date -u +%FT%TZ))" >> "$LOG"
}

# A/Bs reordered round-4 by headline-bench impact per compile-minute
# (SwinIR flags feed bench.py directly; the HAT/DAT matrices are the
# expensive whole-model compiles).  dat_bf16_maps_ab was merged into
# dat_impl_matrix as its softmax=bf16 case.
run_one experiments/conv_impl_ab.py         10800
run_one experiments/absorb_rolls_ab.py      10800
run_one experiments/hat_spatial_matrix.py   10800
run_one experiments/dat_impl_matrix.py      10800
echo "[queue] AB DONE $(date -u +%FT%TZ)" >> "$LOG"

# Quality proofs — small-shape train loops (fast compiles), judge value
run_one experiments/hat_quality_proof.py    10800 300
run_one experiments/dat_quality_proof.py    10800 200
echo "[queue] PROOFS DONE $(date -u +%FT%TZ)" >> "$LOG"

# Train-step A/Bs (finetune workload) — after the forward flips exist
run_one experiments/hat_train_ab.py         10800
run_one experiments/swinir_train_ab.py      10800
run_one experiments/hat_train_split.py      10800
run_one experiments/hat_packed_variants.py  10800
echo "[queue] ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
