#!/bin/bash
# Round-5 decisive arm: rest-frame TEXTURED movers (scene chessboard_tex),
# identical scaled protocol to the seven null knob-arms and the mcam rig arm
# (64px, 48 timesteps, 4-camera rig, 2000 iters, dense shading) so the EPE
# delta is attributable to mover texture alone.
#
# Hypothesis (from the full null battery, BASELINE.md): uniform-albedo movers
# only signal their motion at the silhouette, so the between-keyframe
# advection offset is photometrically almost unobservable and the velocity
# MLP stays at init (|v| ~ 0.07 in every K=4 arm).  The reference's InDoorSeg
# scenes are textured renders of real rooms — interior texture is the missing
# observability.  Success: rel_epe_moving clearly < 0.9 (gate the 30k run
# missed); bat precedent says ~0.6 at this scale.
#
# If the gate passes and time remains (NOW_UNTIL), chain a short carousel_tex
# donor so the in-family transfer leg has a matched textured donor.
set -u
cd /root/repo
LOG=logs
SCENE=logs/synth/chess_arm_tex

echo "[tex] train start $(date -u)"
timeout 3600 python -u train_nvfi.py \
  --config configs/synth/chessboard_tex.yaml --synthetic \
  --synth_res 64 --synth_frames 48 --static_dynamic \
  --logdir "$SCENE" \
  nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
  experiment.train_iters 2000 \
  nvfi.upsamp_list "[300, 600]" \
  experiment.print_every 100 experiment.save_every 500 \
  experiment.validate_every 100000 \
  > $LOG/chess_arm_tex.log 2>&1
echo "[tex] train rc=$? $(date -u)"
timeout 1800 python -u scripts/eval_all.py --scene_dir "$SCENE" \
  --res 64 --frames 48 > $LOG/chess_arm_tex_eval.log 2>&1
echo "[tex] eval rc=$? $(date -u)"
grep -E "interpolation|velocity|advection" $LOG/chess_arm_tex_eval.log
echo "[tex] DONE $(date -u)"
