#!/bin/bash
# Post-30k-run TPU queue: waits for the training PID to exit, then runs the
# full round-2 evaluation sequence (one TPU process at a time).
set -u
PID=${1:?usage: post_train_queue.sh <train_pid>}
LOG=/root/repo/logs
cd /root/repo

echo "[queue] waiting for train pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[queue] training done at $(date)"

run() {
  echo "[queue] ===== $* ====="
  timeout 7200 "$@"
  echo "[queue] rc=$? for: $*"
}

# 1. full quality eval of the 30k checkpoint (interp/extrap PSNR, velocity)
run python -u scripts/eval_all.py --scene_dir logs/synth/bat30k_r2 \
    --res 128 --frames 128 > $LOG/eval_all_30k.log 2>&1

# 2. segmentation: distill MaskField from the 30k scene, then render+score
run python -u train_segm.py --config configs/synth/bat.yaml \
    --scene_dir logs/synth/bat30k_r2 > $LOG/segm_train.log 2>&1
run python -u test_segm_render.py --config configs/synth/bat.yaml --synthetic \
    --scene_dir logs/synth/bat30k_r2 > $LOG/segm_render.log 2>&1

# 3. fan donor scene (short run: velocity learned well before full schedule)
run python -u train_nvfi.py --config configs/synth/fan.yaml --synthetic \
    --synth_res 128 --synth_frames 96 --static_dynamic \
    --iters 6000 --logdir logs/synth/fan6k \
    nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
    experiment.print_every 200 > $LOG/fan6k.log 2>&1

# 4. REAL cross-scene motion transfer: fan velocity into the bat scene
run python -u test_transfer_vel.py --config configs/synth/bat.yaml \
    --config2 configs/synth/fan.yaml --synthetic --alpha_grid 128 \
    --scene_dir logs/synth/bat30k_r2 --scene_dir2 logs/synth/fan6k \
    > $LOG/transfer.log 2>&1

# 5. turbo measurement on the trained checkpoint
run python -u scripts/turbo_bench.py --scene_dir logs/synth/bat30k_r2 \
    --budget 0.35 > $LOG/turbo.log 2>&1

# 6. final parity bench for the record
run python -u bench.py > $LOG/bench_final.log 2>&1

echo "[queue] ALL DONE at $(date)"

# 7. parity trajectory "ours" on the TPU (fast; the CPU run doubles as a
#    CPU-vs-TPU consistency check)
run python -u scripts/parity_trajectory.py --phase ours_tpu --iters 300 \
    > $LOG/parity_ours_tpu.log 2>&1
echo "[queue] extended steps done at $(date)"
