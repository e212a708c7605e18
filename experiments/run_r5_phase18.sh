#!/bin/bash
# Round-5 phase-18 (session-3 restart): the previous session ended
# mid-phase-15 (dat_fused_chan_ab_192 interrupted before its first
# compile finished), so phases 16/17/14 never started.  Re-chain the
# remaining cells in value order:
#   1. dat_chan_blockdiag_ab        256^2 — decisive blockdiag-XLA
#      channel A/B + the direct rect-only 256^2 retry
#   2. dat_chan_blockdiag_ab_192    production tile shape
#   3. dat_quality_proof X4         refresh the persistent DAT ckpt
#   4. dat_fused_eval_check2        full-stack dB-transparency guard
#   5. dat_fused_chan_ab_192        interrupted phase-15 cell (chan
#      Pallas kernel at tile shape — lowest value, runs last)
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log

echo "[queue] r5-phase18 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/dat_chan_blockdiag_ab.py 10800 dat_chan_blockdiag_ab
run_one experiments/dat_chan_blockdiag_ab.py 10800 dat_chan_blockdiag_ab_192 192
PROOF_STYLE=grains PROOF_SCALE=X4 \
  run_one experiments/dat_quality_proof.py 10800 dat_grains_x4_r5 1200 10
run_one experiments/dat_fused_eval_check.py 10800 dat_fused_eval_check2
run_one experiments/dat_fused_chan_ab.py 10800 dat_fused_chan_ab_192 192
echo "[queue] r5-phase18 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
