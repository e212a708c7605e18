#!/bin/bash
# THE single on-chip measurement queue (consolidates the earlier
# ab_chain.sh / run_queue.sh runners, which raced for the one TPU).
# Probes the axon backend until it answers, then runs every queued
# round-3 experiment in value order, each logged to experiments/logs/.
# Safe across backend outages: each script is timeout-bounded, failures
# don't stop the chain, and the probe re-runs before every script.
set -u
cd /root/repo
mkdir -p experiments/logs
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

# A/Bs in value order (CLAUDE.md open item 1)
run_one experiments/hat_spatial_matrix.py   5400
run_one experiments/dat_impl_matrix.py      5400
run_one experiments/conv_impl_ab.py         5400
run_one experiments/absorb_rolls_ab.py      5400
run_one experiments/hat_train_ab.py         5400
run_one experiments/hat_packed_variants.py  5400
run_one experiments/hat_train_split.py      5400
echo "[queue] AB DONE $(date -u +%FT%TZ)" >> "$LOG"

# Quality proofs (g) — long TPU trains, run last
run_one experiments/hat_quality_proof.py    7200 300
run_one experiments/dat_quality_proof.py    7200 200
echo "[queue] ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
