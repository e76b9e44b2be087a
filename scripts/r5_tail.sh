#!/bin/bash
# Round-5 tail queue — chains after the 30k battery (waits on
# /tmp/r5_chess30k.pid).  Deadline-guarded: no task starts past DEADLINE
# (UTC HHMM) so the driver's end-of-round bench.py finds the chip free.
#
#   1. extrap arm D: velocity-MLP capacity 128 -> 256 (VERDICT r4 item 4a)
#   2. eval-time RK2 dt probe on the converged chessboard ckpt (item 4b)
#   3. fixed-slice attribution of the last ~7 ms/chunk (item 5)
#   4. Mosaic row-gather re-probe on this session's jax (item 9)
set -u
cd /root/repo
LOG=logs
DEADLINE=${DEADLINE:-2200}   # UTC HHMM

P=$(cat /tmp/r5_chess30k.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
sleep 10
echo "[tail] start $(date -u)"

past_deadline() { [ "$(date -u +%H%M)" -ge "$DEADLINE" ]; }
run() {
  if past_deadline; then echo "[tail] deadline — skipping: $*"; return; fi
  echo "[tail] ===== $(date -u +%H:%M:%S) $* ====="
  timeout "${T:-1800}" "$@"
  echo "[tail] rc=$? for: $*"
}

T=3600 run python -u scripts/extrap_ablate.py --arms D --iters 4000 \
  --out logs/extrap_ablate_r5.json > $LOG/extrap_ablate_D_r5.log 2>&1
T=1800 run python -u scripts/extrap_dt_probe.py --scene_dir logs/synth/chess30k_r5 \
  --config configs/synth/chessboard.yaml --res 96 --frames 96 \
  --out logs/extrap_dt_probe_r5.json > $LOG/extrap_dt_probe_r5.log 2>&1
T=1800 run python -u scripts/r5_fixed_slice.py > $LOG/fixed_slice_r5.log 2>&1
T=1200 run env NVFI_TEST_TPU=1 python -m pytest tests/test_mosaic_probe.py -q \
  > $LOG/mosaic_probe_r5.log 2>&1
echo "[tail] ALL DONE $(date -u)"
