#!/bin/bash
# Round-5 chessboard velocity-null diagnosis (VERDICT r4 "Next round" item 2).
#
# The r4c control (logs/chess_r4c_*.log, scene logs/synth/chessboard_r4c) ran
# the scaled 2000-iter schedule and produced a DEAD velocity field (relative
# EPE ~1.0; scripts/chess_probe.py confirms the MLP is ~at init and predicts
# noise).  Each arm below changes exactly ONE suspect vs that control and
# reruns the identical protocol (synth 64px/48f, 2000 iters, upsamp [300,600],
# bf16), then scores velocity EPE + interp PSNR with eval_all:
#
#   shade1   — dense shading (shade_fraction 1.0): kills the early top-K
#              truncation (247k samples/step at upsample@300 on the control;
#              on a black-bg scene the missing weight mass biases toward
#              diffuse "fog" density that can absorb motion without velocity)
#   k16      — num_keyframes 4 -> 16: post-snap offsets drop 0.125 -> ~0.025,
#              shrinking the density-ghosting window that lets the kplane
#              explain motion without the velocity field (diagnostic arm; the
#              reference family is K=4, so this pins a cause, not a config)
#   velreg5  — vel_reg_weight 1 -> 5 (judge's arm c)
#   gatebox  — sur box widened to the full bbox (gate effectively off,
#              judge's arm b)
#
# ONE TPU process at a time; arms run sequentially, each timeout-bounded.
set -u
cd /root/repo
LOG=logs
mkdir -p "$LOG"
SUMMARY=$LOG/r5_arms_summary.log
echo "[arms] start $(date -u)" | tee -a "$SUMMARY"

run_arm() {
  local name=$1; shift
  local scene=logs/synth/chess_arm_$name
  echo "[arms] ===== arm $name: $* =====" | tee -a "$SUMMARY"
  timeout 2700 python -u train_nvfi.py \
    --config configs/synth/chessboard.yaml --synthetic \
    --synth_res 64 --synth_frames 48 --static_dynamic \
    --logdir "$scene" \
    nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
    experiment.train_iters 2000 \
    nvfi.upsamp_list "[300, 600]" \
    experiment.print_every 100 experiment.save_every 500 \
    experiment.validate_every 100000 \
    "$@" > $LOG/chess_arm_$name.log 2>&1
  echo "[arms] $name train rc=$? $(date -u)" | tee -a "$SUMMARY"
  timeout 1500 python -u scripts/eval_all.py --scene_dir "$scene" \
    --res 64 --frames 48 > $LOG/chess_arm_${name}_eval.log 2>&1
  echo "[arms] $name eval rc=$?" | tee -a "$SUMMARY"
  grep -E "velocity t=|advection|interpolation" $LOG/chess_arm_${name}_eval.log \
    | sed "s/^/[$name] /" | tee -a "$SUMMARY"
  tail -3 $LOG/chess_arm_$name.log | sed "s/^/[$name] /" | tee -a "$SUMMARY"
}

run_arm shade1 nvfi.shade_fraction 1.0
run_arm k16 nvfi.num_keyframes 16 nvfi.num_keyframes_end 16
run_arm velreg5 experiment.vel_reg_weight 5
run_arm gatebox nvfi.sur_x "[-2.02, 2.02]" nvfi.sur_y "[-2.02, 2.02]" nvfi.sur_z "[-2.02, 2.02]"

echo "[arms] ALL DONE $(date -u)" | tee -a "$SUMMARY"
