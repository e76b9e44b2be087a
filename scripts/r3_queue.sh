#!/bin/bash
# Round-3 TPU queue: parity-ours run, full 30k TURBO training, then the
# evaluation battery.  One TPU process at a time (CLAUDE.md).
set -u
LOG=/root/repo/logs
cd /root/repo

run() {
  echo "[queue] ===== $(date +%H:%M:%S) $* ====="
  timeout "${T:-7200}" "$@"
  echo "[queue] rc=$? for: $*"
}

# 0. turbo shakedown: tiny run exercising the alpha-event -> probe -> turbo
#    meta flip ON DEVICE before committing to the 30k run
echo "[queue] ===== $(date +%H:%M:%S) turbo shakedown ====="
timeout 3600 python -u train_nvfi.py --config configs/synth/bat.yaml \
    --synthetic --synth_res 64 --synth_frames 16 --static_dynamic \
    --iters 120 --logdir logs/synth/shakedown \
    nvfi.compute_dtype bfloat16 nvfi.N_voxel_init 32768 \
    nvfi.N_voxel_final 262144 nvfi.upsamp_list "[80]" \
    nvfi.turbo true nvfi.update_AlphaMask_list "[40]" \
    experiment.print_every 20 > $LOG/shakedown.log 2>&1
rc=$?
echo "[queue] shakedown rc=$rc"
if [ "$rc" != 0 ]; then
  echo "[queue] SHAKEDOWN FAILED - aborting queue"; exit 1
fi

# 1. ours leg of the converged comparison (64^3 parity scale, ~20 min)
T=5400 run python -u scripts/converged_compare.py --phase ours --iters 2500 \
    > $LOG/parity2_ours.log 2>&1

# 2. FULL 30k turbo training: reference schedule + alpha events at 2k/4k
#    (reference-native machinery; bat.yaml ships them empty) + nvfi.turbo
T=28800 run python -u train_nvfi.py --config configs/synth/bat.yaml \
    --synthetic --synth_res 128 --synth_frames 128 --static_dynamic \
    --logdir logs/synth/bat30k_turbo \
    nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
    nvfi.turbo true nvfi.update_AlphaMask_list "[2000, 4000]" \
    experiment.print_every 100 > $LOG/bat30k_turbo.log 2>&1

# 3. export the REAL occupancy state for bench.py's committed asset
T=3600 run python -u scripts/export_bench_alpha.py \
    --scene_dir logs/synth/bat30k_turbo > $LOG/export_alpha.log 2>&1

# 4. full quality eval of the turbo run (interp/extrap + velocity EPE)
T=7200 run python -u scripts/eval_all.py --scene_dir logs/synth/bat30k_turbo \
    --res 128 --frames 128 > $LOG/eval_all_30k_turbo.log 2>&1

# 5. cross-scene transfer with the new t=0 correctness check + sweep GIF
T=7200 run python -u test_transfer_vel.py --config configs/synth/bat.yaml \
    --config2 configs/synth/fan.yaml --synthetic --alpha_grid 128 \
    --scene_dir logs/synth/bat30k_turbo --scene_dir2 logs/synth/fan6k \
    > $LOG/transfer_r3.log 2>&1

# 6. extrapolation-gap ablation arms (VERDICT r2 item 3)
T=14400 run python -u scripts/extrap_ablate.py --iters 4000 \
    > $LOG/extrap_ablate.log 2>&1

# 7. ours eval leg of the converged comparison
T=3600 run python -u scripts/converged_compare.py --phase ours_eval \
    > $LOG/parity2_ours_eval.log 2>&1

# 8. final bench (turbo config via the exported asset)
T=5400 run python -u bench.py > $LOG/bench_r3.log 2>&1

echo "[queue] ALL DONE at $(date)"
