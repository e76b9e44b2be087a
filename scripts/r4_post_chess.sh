#!/bin/bash
# Round-4 tail queue: runs AFTER the chessboard chain (scripts/r4_chessboard.sh)
# releases the TPU.  One TPU process at a time; every task is timeout-bounded
# and the whole queue observes a hard deadline so the driver's end-of-round
# bench.py finds the chip free.
#
#   1. sample_block 8 bench probe  — the next (and per docs/pallas_decision.md
#      §5 likely last) block-granularity point; exactness-certified by the
#      bench's dropped==0 assert, so a win can flip the benched config on
#      bench evidence alone.
#   2. extrap dt probe             — eval-time RK2 refinement on the existing
#      30k checkpoint (integration-error vs method-level hypothesis split).
#   3. extrap ablate arm D         — velocity-MLP capacity 128->256 at the
#      64^3/4k-iter scale (VERDICT r3 item 9 stretch arm).
set -u
cd /root/repo
LOG=logs
DEADLINE=${DEADLINE:-"11:10"}   # UTC HH:MM — no new task starts after this

past_deadline() {
  [ "$(date -u +%H%M)" -ge "$(echo "$DEADLINE" | tr -d :)" ]
}

# Wait for the chessboard chain to finish (ALL DONE marker), with a dead-pid
# fallback in case the chain script itself died.
while true; do
  grep -q "ALL DONE" $LOG/r4_chessboard_outer.log 2>/dev/null && break
  if past_deadline; then echo "[post] deadline before chess finished"; exit 0; fi
  pgrep -af "r4_chessboard.sh" > /dev/null 2>&1 || {
    # chain gone without the marker: make sure no trainer/eval still holds the chip
    sleep 120
    pgrep -af "train_nvfi.py|eval_all.py|train_segm.py|test_segm_render.py" > /dev/null 2>&1 || break
  }
  sleep 60
done
echo "[post] TPU free at $(date -u)"

run() {
  if past_deadline; then echo "[post] deadline — skipping: $*"; return; fi
  echo "[post] ===== $(date -u +%H:%M:%S) $* ====="
  timeout "${T:-1800}" "$@"
  echo "[post] rc=$? for: $*"
}

T=900  run python -u bench.py 8192 nvfi.sample_block 8 2>&1 | tee $LOG/bench_sb8.log
T=2400 run python -u scripts/extrap_ablate.py --arms D --iters 4000 \
         --out logs/extrap_ablate_r4.json > $LOG/extrap_ablate_D.log 2>&1
T=2400 run python -u scripts/extrap_dt_probe.py --scene_dir logs/synth/bat30k_s125 \
         > $LOG/extrap_dt_probe.log 2>&1
echo "[post] ALL DONE at $(date -u)"
