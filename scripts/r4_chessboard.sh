#!/bin/bash
# Round-4 'sur'-gated scene campaign (VERDICT r3 item 3): train the synthetic
# InDoorSeg stand-in (configs/synth/chessboard.yaml — black bg, K=4,
# VelocityAABBSur gating, NO alpha events, upsamples to 8M voxels) to
# convergence, then run the full quality battery (eval renders + velocity EPE
# + segm distill + segm metrics).  Runs the PRODUCTION defaults: dense block
# sampling (block_budget 1.0 — chessboard.yaml sets no turbo keys) with the
# quality-certified shade cap 0.25, i.e. the same shading config the bat 30k
# turbo evidence covers — so this run doubles as that config's first
# certification on the second (sur-gated) scene family.  The
# "[turbo] stage truncation" lines in chess30k.log are the device-side
# running-max counters reporting the shade-cap truncation at stage
# boundaries, as designed.
#
# Waits for the bat post-queue to finish first (ONE TPU process at a time).
# Training runs under the new in-framework supervisor (train_nvfi --supervise)
# — this is its first run in anger.
set -u
cd /root/repo
LOG=logs
SCENE=logs/synth/chessboard30k
ITERS=${ITERS:-30000}
RES=${RES:-96}
FRAMES=${FRAMES:-96}

# Wait for the TPU to be free.  The bat watchdog starts the post queue up to
# 120 s AFTER the trainer exits, so "both pids dead" alone races that gap:
# wait for the post queue's DONE marker, with a 30-min idle fallback in case
# the watchdog itself died before triggering it.
idle=0
while true; do
  grep -q "POST DONE" logs/r4_queue_post.log 2>/dev/null && break
  TP=$(cat /tmp/train30k_r4.pid 2>/dev/null)
  QP=$(cat /tmp/queue_r4.pid 2>/dev/null)
  busy=0
  [ -n "$TP" ] && kill -0 "$TP" 2>/dev/null && busy=1
  [ -n "$QP" ] && kill -0 "$QP" 2>/dev/null && busy=1
  if [ "$busy" = 0 ]; then
    idle=$((idle + 60)); [ "$idle" -ge 1800 ] && break
  else
    idle=0
  fi
  sleep 60
done
echo "[chess] TPU free at $(date); bench sweep first, then supervised training"
bash scripts/r4_bench_sweep.sh > $LOG/bench_sweep_r4.log 2>&1

python -u train_nvfi.py --config configs/synth/chessboard.yaml --synthetic \
  --synth_res "$RES" --synth_frames "$FRAMES" --static_dynamic --supervise \
  --stall_timeout 1800 --logdir "$SCENE" \
  nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
  experiment.train_iters "$ITERS" \
  experiment.print_every 100 experiment.save_every 2500 \
  >> $LOG/chess30k.log 2>&1
echo "[chess] training rc=$? at $(date)"

run() {
  echo "[chess] ===== $(date +%H:%M:%S) $* ====="
  timeout "${T:-7200}" "$@"
  echo "[chess] rc=$? for: $*"
}

T=7200 run python -u scripts/eval_all.py --scene_dir "$SCENE" \
  --res "$RES" --frames "$FRAMES" > $LOG/eval_all_chess.log 2>&1
T=7200 run python -u train_segm.py --config configs/synth/chessboard.yaml \
  --scene_dir "$SCENE" > $LOG/segm_train_chess.log 2>&1
T=7200 run python -u test_segm_render.py --config configs/synth/chessboard.yaml \
  --synthetic --scene_dir "$SCENE" --export_points 48 \
  > $LOG/segm_render_chess.log 2>&1
echo "[chess] ALL DONE at $(date)"
