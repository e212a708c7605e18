#!/bin/bash
# Round-4 phase-3 queue (session 3): waits for the run_all.sh backlog
# drain (whose PID is $1) to exit, then runs the follow-ups born from
# its results:
#   1. bench_shape_ab  — absorb x {halo conv, pad-fold} at the bench
#      shape (chasing the 22.3 MPix/s VERDICT target)
#   2. bench.py        — bank a headline number with the new defaults
#   3. hat_train_ab    — re-run with the PACKED_GROUP_BWD=8 VMEM fix
#   4. mosaic_diag     — full error text for the four "rejected" kernels
#   5. run_r4_phase2.sh — grains quality proofs (longest, last)
# Same discipline as run_all.sh: setsid launch, 3h timeouts, shared
# persistent compile cache, probe before every script.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
WAIT_PID=${1:-}

if [ -n "$WAIT_PID" ]; then
  echo "[queue] phase3 waiting for pid $WAIT_PID ($(date -u +%FT%TZ))" >> "$LOG"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "[queue] phase3 start $(date -u +%FT%TZ)" >> "$LOG"

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

run_one experiments/bench_shape_ab.py 10800 bench_shape_ab
probe
echo "[queue] run bench ($(date -u +%FT%TZ))" >> "$LOG"
timeout 3600 python -u bench.py > experiments/logs/bench_r4_flips.log 2>&1
echo "[queue] done bench rc=$? ($(date -u +%FT%TZ))" >> "$LOG"
run_one experiments/hat_train_ab.py 10800 hat_train_ab2
run_one experiments/mosaic_diag.py 10800 mosaic_diag
echo "[queue] phase3 A/Bs DONE $(date -u +%FT%TZ)" >> "$LOG"
bash experiments/run_r4_phase2.sh
echo "[queue] phase3 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
