#!/bin/bash
# Round-4 TPU queue: cash in the measured shade-0.125 headroom (VERDICT r3
# item 1).  One TPU process at a time (CLAUDE.md).
#
# 0. shakedown: tiny turbo run exercising the NEW device-side exactness
#    counters (advisor r3 medium finding) through alpha-event -> probe ->
#    turbo flip ON DEVICE before committing 3h to the 30k run
# 1. FULL 30k training at shade_fraction 0.125 — measured at 253 ms/step =
#    16.2k rays/s in the round-3 continuation probe
#    (logs/turbo_quality_shade125b.log).  The block budget is NOT pinned:
#    the per-stage probe sets it (round 3 needed 0.583 at it=2000 / 0.375 at
#    it=4000 — pinning 0.3 would drop real blocks early in the schedule).
# 2-4. the BASELINE.md quality battery on the new scene (eval_all + segm)
set -u
LOG=/root/repo/logs
cd /root/repo

run() {
  echo "[queue] ===== $(date +%H:%M:%S) $* ====="
  timeout "${T:-7200}" "$@"
  echo "[queue] rc=$? for: $*"
}

echo "[queue] ===== $(date +%H:%M:%S) shade-125 shakedown ====="
timeout 3600 python -u train_nvfi.py --config configs/synth/bat.yaml \
    --synthetic --synth_res 64 --synth_frames 16 --static_dynamic \
    --iters 120 --logdir logs/synth/shakedown_r4 \
    nvfi.compute_dtype bfloat16 nvfi.N_voxel_init 32768 \
    nvfi.N_voxel_final 262144 nvfi.upsamp_list "[80]" \
    nvfi.turbo true nvfi.update_AlphaMask_list "[40]" \
    nvfi.shade_fraction 0.125 \
    experiment.print_every 20 > $LOG/shakedown_r4.log 2>&1
rc=$?
echo "[queue] shakedown rc=$rc"
if [ "$rc" != 0 ]; then
  echo "[queue] SHAKEDOWN FAILED - aborting queue"; exit 1
fi

# 1. FULL 30k at the shade-0.125 configuration, launched detached: the
#    watchdog (scripts/r4_watchdog.sh) supervises it — stall-kill + resume —
#    and runs the post-queue when it completes.
rm -f /tmp/train30k_r4.restarts /tmp/queue_r4.pid
nohup python -u train_nvfi.py --config configs/synth/bat.yaml \
    --synthetic --synth_res 128 --synth_frames 128 --static_dynamic \
    --logdir logs/synth/bat30k_s125 \
    nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
    nvfi.turbo true nvfi.update_AlphaMask_list "[2000, 4000]" \
    nvfi.shade_fraction 0.125 \
    experiment.print_every 100 experiment.save_every 2500 \
    > $LOG/bat30k_s125.log 2>&1 &
echo $! > /tmp/train30k_r4.pid
echo "[queue] 30k training launched pid=$(cat /tmp/train30k_r4.pid)"
