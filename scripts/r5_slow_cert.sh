#!/bin/bash
# Round-5 FINAL certification queue (serial TPU — one process at a time).
#
# Rationale (BASELINE.md "Sur-family velocity-null diagnosis"): the
# speed-calibrated slow arm is the only configuration whose velocity field
# came ALIVE during training (|v| 0.005 @ it700 -> 0.022 @ it2000, still
# rising; every other arm sat at init) and posted the best EPE of the
# battery (rel_epe_moving 0.961 vs 0.99-1.11).  It missed the 0.9 launch
# gate at the 2000-iter scaled protocol, but the |v| trajectory says
# UNDER-TRAINING, not saddle — so the certification resumes that exact
# checkpoint instead of burning 40 min re-reaching it.
#
# Segmented (2000->7000->12000) with an eval after each segment so a
# deadline mid-run still leaves a measured EPE trend, at the cost of one
# extra remote compile (~12 min).  lr_decay_iters is pinned to 12000 in
# both segments so the lr schedule is consistent across the resume.
#
# After the cert: the segm + donor + transfer battery runs UNCONDITIONALLY
# (the sur-family segm/transfer rows are owed either way — VERDICT r4
# missing #2), then the two owed extrapolation probes (VERDICT r4 item 4).
set -u
cd /root/repo
LOG=logs
CERT=logs/synth/chess_slow_cert
DONOR=logs/synth/carousel_slow_donor

if [ ! -d "$CERT" ]; then
  cp -a logs/synth/chess_arm_slow "$CERT"
  echo "[cert] seeded $CERT from the slow arm (it=2000, |v| alive)"
fi

run() {
  echo "[cert] ===== $(date -u +%H:%M:%S) $* ====="
  timeout "${T:-3600}" "$@"
  echo "[cert] rc=$? for: $*"
}

seg() { # seg <iters> <tag>
  T=9000 run python -u train_nvfi.py \
    --config configs/synth/chessboard_slow.yaml --synthetic \
    --synth_res 64 --synth_frames 48 --static_dynamic \
    --resume --supervise --stall_timeout 1800 --logdir "$CERT" \
    nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
    experiment.train_iters "$1" experiment.lr_decay_iters 12000 \
    nvfi.upsamp_list "[300, 600]" \
    experiment.print_every 200 experiment.save_every 1000 \
    experiment.validate_every 100000 \
    > "$LOG/chess_slow_cert_$2.log" 2>&1
  T=1800 run python -u scripts/eval_all.py --scene_dir "$CERT" \
    --res 64 --frames 48 > "$LOG/chess_slow_cert_eval_$2.log" 2>&1
  grep -E "interpolation|velocity|advection" "$LOG/chess_slow_cert_eval_$2.log" \
    | sed "s/^/[cert-$2] /"
}

echo "[cert] start $(date -u)"
seg 7000 s1
seg 12000 s2

# ---- segm + transfer battery (owed for the family regardless of EPE) ----
T=3600 run python -u train_segm.py --config configs/synth/chessboard_slow.yaml \
  --scene_dir "$CERT" > $LOG/segm_train_slow_r5.log 2>&1
T=3600 run python -u test_segm_render.py --config configs/synth/chessboard_slow.yaml \
  --synthetic --scene_dir "$CERT" --export_points 48 \
  > $LOG/segm_render_slow_r5.log 2>&1
grep -E "AP|PQ|F1|mIoU|RI" $LOG/segm_render_slow_r5.log | tail -4 | sed 's/^/[slow-segm] /'

T=3000 run python -u train_nvfi.py --config configs/synth/carousel_slow.yaml --synthetic \
  --synth_res 64 --synth_frames 48 --static_dynamic --logdir "$DONOR" \
  nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
  experiment.train_iters 2000 nvfi.upsamp_list "[300, 600]" \
  experiment.print_every 200 experiment.save_every 1000 \
  experiment.validate_every 100000 \
  > $LOG/carousel_slow_donor.log 2>&1
T=2400 run python -u test_transfer_vel.py --config configs/synth/chessboard_slow.yaml \
  --config2 configs/synth/carousel_slow.yaml --synthetic \
  --scene_dir "$CERT" --scene_dir2 "$DONOR" \
  > $LOG/transfer_slow_r5.log 2>&1
tail -8 $LOG/transfer_slow_r5.log | sed 's/^/[slow-transfer] /'

# ---- owed extrapolation probes (VERDICT r4 item 4) ----
T=1800 run python -u scripts/extrap_dt_probe.py --scene_dir "$CERT" \
  --config configs/synth/chessboard_slow.yaml --res 64 --frames 48 \
  --out logs/extrap_dt_probe_r5.json > $LOG/extrap_dt_probe_r5.log 2>&1
T=7200 run python -u scripts/extrap_ablate.py --arms D --iters 4000 \
  --out logs/extrap_ablate_r5.json > $LOG/extrap_ablate_D_r5.log 2>&1

echo "[cert] ALL DONE $(date -u)"
