#!/bin/bash
# Round-5 validation arm for the closed-room scene redesign: identical scaled
# protocol to the five null knob-arms (64px, 48 frames, 2000 iters, dense)
# so the EPE delta is attributable to the scene fix alone.  Success gate for
# launching the 30k run: relative EPE (moving split) clearly below 1.
set -u
cd /root/repo
LOG=logs
SCENE=logs/synth/chess_arm_room
echo "[room] start $(date -u)"
timeout 3600 python -u train_nvfi.py \
  --config configs/synth/chessboard.yaml --synthetic \
  --synth_res 64 --synth_frames 48 --static_dynamic \
  --logdir "$SCENE" \
  nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
  experiment.train_iters 2000 \
  nvfi.upsamp_list "[300, 600]" \
  experiment.print_every 100 experiment.save_every 500 \
  experiment.validate_every 100000 \
  > $LOG/chess_arm_room.log 2>&1
echo "[room] train rc=$? $(date -u)"
timeout 1800 python -u scripts/eval_all.py --scene_dir "$SCENE" \
  --res 64 --frames 48 > $LOG/chess_arm_room_eval.log 2>&1
echo "[room] eval rc=$? $(date -u)"
grep -E "interpolation|velocity|advection" $LOG/chess_arm_room_eval.log
echo "[room] DONE $(date -u)"
