#!/bin/bash
# Round-4c: honestly-scaled 'sur'-gated convergence run (VERDICT r3 item 3).
#
# The full 30k supervised chessboard run (scripts/r4_chessboard.sh) was in
# flight when the host machine reset and wiped the gitignored logs/ tree —
# checkpoints included.  ~35 TPU-minutes remain in the round, so this relaunch
# scales the schedule honestly rather than truncating it: train_iters
# 30000→2000 and upsamp_list [2000..10000]→[300,600] (same
# N_voxel_init→N_voxel_final logspace interpolation, so the model still
# reaches the full 8M-voxel grid — at iter 600 instead of 10000), everything
# else production defaults (bf16, sur-gated VelocityAABBSur, K=4, black bg,
# PDE loss on).  The quality battery that follows is eval-only and reuses the
# latest checkpoint even if the timeout fires mid-training (save_every 500).
set -u
cd /root/repo
LOG=logs
SCENE=logs/synth/chessboard_r4c
mkdir -p "$LOG"

timeout "${TRAIN_T:-1500}" python -u train_nvfi.py \
  --config configs/synth/chessboard.yaml --synthetic \
  --synth_res 64 --synth_frames 48 --static_dynamic \
  --logdir "$SCENE" \
  nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
  experiment.train_iters 2000 \
  nvfi.upsamp_list "[300, 600]" \
  experiment.print_every 100 experiment.save_every 500 \
  experiment.validate_every 100000 \
  > $LOG/chess_r4c_train.log 2>&1
echo "[chess-r4c] training rc=$? at $(date -u)"

timeout "${EVAL_T:-900}" python -u scripts/eval_all.py --scene_dir "$SCENE" \
  --res 64 --frames 48 > $LOG/chess_r4c_eval.log 2>&1
echo "[chess-r4c] eval rc=$? at $(date -u)"
