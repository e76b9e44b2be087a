#!/bin/bash
# Round-4 post-training battery for the shade-0.125 30k run: the complete
# BASELINE.md turbo-vs-dense quality table (test/interp/extrap PSNR, velocity
# EPE, advection, segm) + the new bench asset.  Separated so the watchdog can
# resume here after a mid-training restart.
set -u
LOG=/root/repo/logs
SCENE=logs/synth/bat30k_s125
cd /root/repo

run() {
  echo "[queue] ===== $(date +%H:%M:%S) $* ====="
  timeout "${T:-7200}" "$@"
  echo "[queue] rc=$? for: $*"
}

# 1. export the REAL occupancy of the new run for bench.py's committed asset
T=3600 run python -u scripts/export_bench_alpha.py \
    --scene_dir $SCENE > $LOG/export_alpha_r4.log 2>&1

# 2. full quality eval (test/interp/extrap PSNR+SSIM, velocity EPE, advection)
T=7200 run python -u scripts/eval_all.py --scene_dir $SCENE \
    --res 128 --frames 128 > $LOG/eval_all_30k_s125.log 2>&1

# 3. segmentation: distill MaskField from the new scene, render + score
T=7200 run python -u train_segm.py --config configs/synth/bat.yaml \
    --scene_dir $SCENE > $LOG/segm_train_s125.log 2>&1
T=7200 run python -u test_segm_render.py --config configs/synth/bat.yaml \
    --synthetic --scene_dir $SCENE --export_points 48 \
    > $LOG/segm_render_s125.log 2>&1

echo "[queue] POST DONE at $(date)"
