#!/bin/bash
# Round-5 phase-9 (session-2 restart): the previous session's runner
# died mid-phase-6.  Re-chains the remaining work in value order:
#   1. phase-7 fused-DATB revalidation + decisive A/B (group8 dwconv,
#      split-shifted rect, 256^2 interleaved tail/rect A/B)
#   2. phase-6b swinir X4 grains 4000-ep long run (budget-limit probe,
#      VERDICT r4 weak #3) — the interrupted attempt left no ckpt
#   3. phase-8 x8-TTA column for the full X4 grains table
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] r5-phase9 start $(date -u +%FT%TZ)" >> "$LOG"

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
  setsid timeout "$tmo" python -u "$script" "$@" > "experiments/logs/$logname.log" 2>&1
  echo "[queue] done $logname rc=$? ($(date -u +%FT%TZ))" >> "$LOG"
}

run_one experiments/fused_tail_diag.py 3600 fused_tail_diag4
run_one experiments/fused_rect_diag.py 3600 fused_rect_diag2
run_one experiments/dat_fused_tail_ab.py 10800 dat_fused_tail_ab3
echo "[queue] r5-phase7 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
PROOF_STYLE=grains PROOF_SCALE=X4 run_one experiments/swinir_quality_proof.py 10800 swinir_grains_x4_long 4000 50
echo "[queue] r5-phase6 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
run_one experiments/tta_x4_eval.py 14400 tta_x4_eval
echo "[queue] r5-phase8 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
echo "[queue] r5-phase9 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
