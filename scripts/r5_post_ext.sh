#!/bin/bash
# Final round-5 TPU tail: after the extension segments, re-run the
# segmentation battery on the furthest cert checkpoint (segmentation
# clusters advected points by rigid motion, so it tracks velocity-field
# quality — the 12k-checkpoint rows were taken at rel_epe_moving 0.85).
# Deadline-guarded: the driver needs the chip for bench.py at round end.
set -u
cd /root/repo
LOG=logs
CERT=logs/synth/chess_slow_cert
HARD_STOP=$(date -ud "2026-08-20 06:10" +%s)

P=$(cat /tmp/r5_ext.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
sleep 15
echo "[post] start $(date -u)"

fits() { [ $(( $(date +%s) + $1 )) -lt "$HARD_STOP" ]; }

run() {
  echo "[post] ===== $(date -u +%H:%M:%S) $* ====="
  timeout "${T:-2400}" "$@"
  echo "[post] rc=$? for: $*"
}

STEP=$(ls "$CERT"/model_*.json 2>/dev/null | tail -1)
echo "[post] furthest checkpoint: $STEP"

# dt probe re-run: the queued run rendered white-on-black (white_bg was
# hardcoded for bat) and read ~5 dB at every scale — fixed to follow the
# config background; re-measure on the furthest checkpoint
if fits 1800; then
  T=1500 run python -u scripts/extrap_dt_probe.py --scene_dir "$CERT" \
    --config configs/synth/chessboard_slow.yaml --res 64 --frames 48 \
    --out logs/extrap_dt_probe_r5b.json > $LOG/extrap_dt_probe_r5b.log 2>&1
  tail -14 $LOG/extrap_dt_probe_r5b.log | sed 's/^/[post-dt] /'
fi

case "$STEP" in
  *model_11999*) echo "[post] no extension landed; segm rows at 12k already measured"; exit 0;;
esac

if fits 2700; then
  T=2400 run python -u train_segm.py --config configs/synth/chessboard_slow.yaml \
    --scene_dir "$CERT" > $LOG/segm_train_slow_ext.log 2>&1
  T=2400 run python -u test_segm_render.py --config configs/synth/chessboard_slow.yaml \
    --synthetic --scene_dir "$CERT" --export_points 48 \
    > $LOG/segm_render_slow_ext.log 2>&1
  grep -E "AP@|mIoU" $LOG/segm_render_slow_ext.log | tail -2 | sed 's/^/[post-segm] /'
else
  echo "[post] skip segm re-run (deadline)"
fi
echo "[post] ALL DONE $(date -u)"
