#!/bin/bash
# Chained on-chip A/B queue (CLAUDE.md open item 1).
# Probes the axon TPU backend until it answers, then runs the queued
# experiment scripts in value order, each logged to experiments/logs/.
# Safe to leave running across a backend outage: every script is
# bounded by a timeout and failures don't stop the chain.
set -u
cd /root/repo
mkdir -p experiments/logs
LOG=experiments/logs/queue.log
echo "[queue] start $(date -u +%FT%TZ)" >> "$LOG"

probe() {
  until timeout 300 python -c "import jax; jax.devices(); print('TPU_UP')" 2>/dev/null | grep -q TPU_UP; do
    echo "[queue] backend down, retry in 120s ($(date -u +%FT%TZ))" >> "$LOG"
    sleep 120
  done
  echo "[queue] backend UP ($(date -u +%FT%TZ))" >> "$LOG"
}

run_one() {
  local script=$1 tmo=$2
  local name=$(basename "$script" .py)
  probe
  echo "[queue] run $name ($(date -u +%FT%TZ))" >> "$LOG"
  timeout "$tmo" python -u "$script" > "experiments/logs/$name.log" 2>&1
  echo "[queue] done $name rc=$? ($(date -u +%FT%TZ))" >> "$LOG"
}

run_one experiments/hat_spatial_matrix.py   5400
run_one experiments/dat_impl_matrix.py      5400
run_one experiments/hat_packed_variants.py  5400
run_one experiments/conv_impl_ab.py         5400
run_one experiments/hat_train_ab.py         5400
run_one experiments/absorb_rolls_ab.py      5400
echo "[queue] ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
