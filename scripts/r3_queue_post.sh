#!/bin/bash
# Round-3 post-training evaluation battery (steps 3-8 of r3_queue.sh).
# Separated so the watchdog can resume here after a mid-training restart.
# Ordered critical-first: the benched number and the turbo quality evidence
# are the round's headline artifacts; the long ablation is timeboxed last.
set -u
LOG=/root/repo/logs
cd /root/repo

run() {
  echo "[queue] ===== $(date +%H:%M:%S) $* ====="
  timeout "${T:-7200}" "$@"
  echo "[queue] rc=$? for: $*"
}

T=3600 run python -u scripts/export_bench_alpha.py \
    --scene_dir logs/synth/bat30k_turbo > $LOG/export_alpha.log 2>&1

T=3600 run python -u bench.py > $LOG/bench_r3.log 2>&1

# jax moved to 0.9.0 this round: re-probe the Mosaic dynamic row-gather
# (NEXT.md lever #1) and attribute the turbo chunk's residual cost against
# the real exported occupancy (needs step 1's bench_alpha.npz).
T=1800 run python -u scripts/perf_micro2.py > $LOG/perf_micro2_jax09.log 2>&1

T=2700 run python -u scripts/perf_ablate.py --turbo \
    > $LOG/perf_ablate_turbo.log 2>&1

T=5400 run python -u scripts/eval_all.py --scene_dir logs/synth/bat30k_turbo \
    --res 128 --frames 128 > $LOG/eval_all_30k_turbo.log 2>&1

# parity2 'ours' phase re-run: the 09:26 run predated the save_every
# override so it left no checkpoint; current code saves every 500 iters.
T=5400 run python -u scripts/converged_compare.py --phase ours --iters 2500 \
    > $LOG/parity2_ours.log 2>&1

T=3600 run python -u scripts/converged_compare.py --phase ours_eval \
    > $LOG/parity2_ours_eval.log 2>&1

T=3600 run python -u test_transfer_vel.py --config configs/synth/bat.yaml \
    --config2 configs/synth/fan.yaml --synthetic --alpha_grid 128 \
    --scene_dir logs/synth/bat30k_turbo --scene_dir2 logs/synth/fan6k \
    > $LOG/transfer_r3.log 2>&1

T=9000 run python -u scripts/extrap_ablate.py --iters 4000 \
    > $LOG/extrap_ablate.log 2>&1

echo "[queue] ALL DONE at $(date)"
