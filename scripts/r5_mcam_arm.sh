#!/bin/bash
# Round-5 arm: fixed multi-camera rig (the reference InDoorSeg capture
# protocol — datasets/load_blender_dynamic.py gives each camera ONE pose and
# every timestep).  Identical scaled protocol to the seven null knob-arms
# (64px, 48 timesteps, 2000 iters, dense) so the EPE delta is attributable
# to the rig alone.  First finishes the lrvel10 eval the stalled wave-2
# driver never ran (checkpoint exists at logs/synth/chess_arm_lrvel10).
#
# Success gate for the main certified run: relative EPE (moving split)
# clearly below 1 (bat precedent: 0.62 at a comparable scale).
set -u
cd /root/repo
LOG=logs
SCENE=logs/synth/chess_arm_mcam

echo "[mcam] lrvel10 eval start $(date -u)"
timeout 1500 python -u scripts/eval_all.py --scene_dir logs/synth/chess_arm_lrvel10 \
  --res 64 --frames 48 > $LOG/chess_arm_lrvel10_eval.log 2>&1
echo "[mcam] lrvel10 eval rc=$? $(date -u)"
grep -E "velocity t=|advection|interpolation" $LOG/chess_arm_lrvel10_eval.log | sed 's/^/[lrvel10] /'

echo "[mcam] train start $(date -u)"
timeout 3600 python -u train_nvfi.py \
  --config configs/synth/chessboard.yaml --synthetic \
  --synth_res 64 --synth_frames 48 --static_dynamic \
  --logdir "$SCENE" \
  nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
  experiment.train_iters 2000 \
  nvfi.upsamp_list "[300, 600]" \
  experiment.print_every 100 experiment.save_every 500 \
  experiment.validate_every 100000 \
  > $LOG/chess_arm_mcam.log 2>&1
echo "[mcam] train rc=$? $(date -u)"
timeout 1800 python -u scripts/eval_all.py --scene_dir "$SCENE" \
  --res 64 --frames 48 > $LOG/chess_arm_mcam_eval.log 2>&1
echo "[mcam] eval rc=$? $(date -u)"
grep -E "interpolation|velocity|advection" $LOG/chess_arm_mcam_eval.log
echo "[mcam] DONE $(date -u)"
