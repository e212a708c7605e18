#!/bin/bash
# Round-5 phase-18d: after the shifted-rect w%64 gate fix, re-run the
# dB guard (its 3 shifted/tail cells crashed on the w=48 lowering
# reject) and add the 192^2 self-PSNR transparency check the 48^2
# eval set can't provide.  Then the informational leftovers.
# Usage: run_r5_phase18d.sh <pid-of-running-ab>
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
WAITPID=${1:-0}

if [ "$WAITPID" -gt 0 ]; then
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 20; done
  echo "[queue] done dat_chan_blockdiag_ab_192 (pid $WAITPID exited) ($(date -u +%FT%TZ))" >> "$LOG"
fi
echo "[queue] r5-phase18d start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/dat_fused_eval_check.py 10800 dat_fused_eval_check3
run_one experiments/dat_fused_selfpsnr.py 10800 dat_fused_selfpsnr
run_one experiments/fused_rect_diag.py 7200 fused_rect_diag4
PROOF_STYLE=grains PROOF_SCALE=X4 \
  run_one experiments/dat_quality_proof.py 10800 dat_grains_x4_r5 1200 10
run_one experiments/dat_fused_chan_ab.py 10800 dat_fused_chan_ab_192 192
echo "[queue] r5-phase18d ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
