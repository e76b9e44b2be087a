#!/bin/bash
# Round-5 main event (VERDICT r4 item 1): converge + certify the sur-gated
# InDoorSeg-family stand-in.
#
# Chains after the diagnosis waves (waits on /tmp/r5_arms2.pid).  The arm
# verdicts choose the config via env overrides set by the launcher:
#   EXTRA   — extra "key value" config overrides (e.g. experiment.lr_vel 1e-2)
#   RES/FRAMES/ITERS — protocol scale (default: r4_chessboard's 96/96/30000)
#
# Sur-family THROUGHPUT MODE (VERDICT r4 item 6, opt-in — the reference ships
# update_AlphaMask_list [] for InDoorSeg so turbo can never engage there):
#   TURBO=1 adds alpha events at [2000, 4000] + nvfi.turbo — occupancy-pruned
#   block-sparse sampling with per-step dropped_blocks==0 exactness, plus the
#   round-5 VelGate.world fix so the sur gate survives the alpha-event aabb
#   shrink.  Eval renders stay dense-exact (eval_exact_meta).  Semantic
#   deltas vs the reference schedule, accepted for this mode: the L1 weight
#   resets to L1_weight_reset at the first alpha event, and the aabb shrinks.
#
# Training runs under the in-framework supervisor; checkpoints every 2000 so
# a host reset costs minutes (the r4 run died at 27.5k with save_every 2500).
#
# Battery afterwards: eval_all (test PSNR split + velocity EPE + advection),
# segm distill + segm metrics, carousel donor training (short), and the
# in-family transfer leg carousel -> chessboard.
set -u
cd /root/repo
LOG=logs
SCENE=logs/synth/chess30k_r5
DONOR=logs/synth/carousel_donor_r5
RES=${RES:-96}
FRAMES=${FRAMES:-96}
ITERS=${ITERS:-30000}
TURBO=${TURBO:-1}
EXTRA=${EXTRA:-}

P=$(cat /tmp/r5_arms2.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
sleep 10
echo "[chess30k] start $(date -u) RES=$RES FRAMES=$FRAMES ITERS=$ITERS TURBO=$TURBO EXTRA='$EXTRA'"

TURBO_ARGS=""
if [ "$TURBO" = 1 ]; then
  TURBO_ARGS='nvfi.update_AlphaMask_list [2000, 4000] nvfi.turbo true'
fi

python -u train_nvfi.py --config configs/synth/chessboard.yaml --synthetic \
  --synth_res "$RES" --synth_frames "$FRAMES" --static_dynamic --supervise \
  --stall_timeout 1800 --logdir "$SCENE" \
  nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
  experiment.train_iters "$ITERS" \
  experiment.print_every 100 experiment.save_every 2000 \
  experiment.validate_every 100000 \
  $TURBO_ARGS $EXTRA \
  > $LOG/chess30k_r5.log 2>&1
echo "[chess30k] training rc=$? at $(date -u)"

run() {
  echo "[chess30k] ===== $(date -u +%H:%M:%S) $* ====="
  timeout "${T:-3600}" "$@"
  echo "[chess30k] rc=$? for: $*"
}

T=7200 run python -u scripts/eval_all.py --scene_dir "$SCENE" \
  --res "$RES" --frames "$FRAMES" > $LOG/eval_all_chess30k_r5.log 2>&1
T=5400 run python -u train_segm.py --config configs/synth/chessboard.yaml \
  --scene_dir "$SCENE" > $LOG/segm_train_chess_r5.log 2>&1
T=5400 run python -u test_segm_render.py --config configs/synth/chessboard.yaml \
  --synthetic --scene_dir "$SCENE" --export_points 48 \
  > $LOG/segm_render_chess_r5.log 2>&1

# in-family transfer: short carousel donor (same sur gate, opposite spin),
# then graft its velocity into the converged chessboard host
T=3600 run python -u train_nvfi.py --config configs/synth/carousel.yaml --synthetic \
  --synth_res 64 --synth_frames 48 --static_dynamic --logdir "$DONOR" \
  nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
  experiment.train_iters 2000 nvfi.upsamp_list "[300, 600]" \
  experiment.print_every 200 experiment.save_every 1000 \
  experiment.validate_every 100000 $EXTRA \
  > $LOG/carousel_donor_r5.log 2>&1
T=2400 run python -u test_transfer_vel.py --config configs/synth/chessboard.yaml \
  --config2 configs/synth/carousel.yaml --synthetic \
  --scene_dir "$SCENE" --scene_dir2 "$DONOR" \
  > $LOG/transfer_sur_r5.log 2>&1
echo "[chess30k] ALL DONE at $(date -u)"
