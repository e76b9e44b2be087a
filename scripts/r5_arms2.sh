#!/bin/bash
# Round-5 diagnosis, wave 2 — chains after scripts/r5_arms.sh (waits on its
# pid).  Motivated by the wave-1 live readings: the K=16 arm is the only one
# with a live velocity field (|v| ~0.5 vs ~0.07), pointing at the
# density-ghosting race: at K=4 the post-snap offsets are large (0.125), the
# grid (lr 0.02) out-runs the velocity MLP (lr 1e-3) and absorbs motion as
# per-keyframe ghosting, after which the velocity gradient is starved.
#
#   lrvel10 — lr_vel 1e-3 -> 1e-2 at reference K=4: rebalance the race via a
#             knob the reference itself exposes per config (experiment.lr_vel)
#   res96   — the r4_chessboard 30k protocol's actual data scale (96px, 96
#             frames) at K=4: 4x the mover pixels => 4x the photometric
#             velocity signal; the null arms all ran at the scaled 64px/48f
set -u
cd /root/repo
LOG=logs
SUMMARY=$LOG/r5_arms_summary.log

P=$(cat /tmp/r5_arms.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
sleep 10
echo "[arms2] start $(date -u)" | tee -a "$SUMMARY"

run_arm() {
  local name=$1 res=$2 frames=$3; shift 3
  local scene=logs/synth/chess_arm_$name
  echo "[arms2] ===== arm $name: res=$res frames=$frames $* =====" | tee -a "$SUMMARY"
  timeout 3000 python -u train_nvfi.py \
    --config configs/synth/chessboard.yaml --synthetic \
    --synth_res "$res" --synth_frames "$frames" --static_dynamic \
    --logdir "$scene" \
    nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
    experiment.train_iters 2000 \
    nvfi.upsamp_list "[300, 600]" \
    experiment.print_every 100 experiment.save_every 500 \
    experiment.validate_every 100000 \
    "$@" > $LOG/chess_arm_$name.log 2>&1
  echo "[arms2] $name train rc=$? $(date -u)" | tee -a "$SUMMARY"
  timeout 1500 python -u scripts/eval_all.py --scene_dir "$scene" \
    --res "$res" --frames "$frames" > $LOG/chess_arm_${name}_eval.log 2>&1
  echo "[arms2] $name eval rc=$?" | tee -a "$SUMMARY"
  grep -E "velocity t=|advection|interpolation" $LOG/chess_arm_${name}_eval.log \
    | sed "s/^/[$name] /" | tee -a "$SUMMARY"
  tail -3 $LOG/chess_arm_$name.log | sed "s/^/[$name] /" | tee -a "$SUMMARY"
}

run_arm lrvel10 64 48 experiment.lr_vel 1.0E-2
run_arm res96 96 96

echo "[arms2] ALL DONE $(date -u)" | tee -a "$SUMMARY"
