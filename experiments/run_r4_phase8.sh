#!/bin/bash
# Round-4 phase-8 queue: HAT CAB halo-conv A/B with the strict VMEM
# gate relaxed (cab_conv.STRICT=False) — the 256^2 Mosaic-crash
# evidence is C=180-sized; HAT's CAB convs are C<=96 where shrunk
# rows (~21/49) may compile.  Waits for phase 7 (one TPU process at a
# time).  Same discipline: setsid launch, 3h timeout, shared
# persistent compile cache, probe first, never kill mid-compile.
set -u
cd /root/repo
mkdir -p experiments/logs
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOG=experiments/logs/queue.log
echo "[queue] phase8 waiting for phase7 ($(date -u +%FT%TZ))" >> "$LOG"
until grep -q "phase7 ALL DONE" "$LOG"; do sleep 60; done
echo "[queue] phase8 start $(date -u +%FT%TZ)" >> "$LOG"

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

# qk-nopad rerun first (phase 6 died on the Cin=3 halo Mosaic OOM at
# HAT model.init, fixed by the cin<8 refusal + INPUT_IMPL="xla")
run_one experiments/hat_qk_nopad_ab.py 10800 hat_qk_nopad_ab
run_one experiments/hat_cab_halo_ab.py 10800 hat_cab_halo_ab
echo "[queue] phase8 ALL DONE $(date -u +%FT%TZ)" >> "$LOG"
