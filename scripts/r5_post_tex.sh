#!/bin/bash
# Chains after the textured-mover arm (waits on /tmp/r5_tex.pid).
#
# If the arm clears the certification gate (rel_epe_moving < 0.9), the
# velocity field of the sur family is finally live — run the rest of the
# VERDICT r4 item-1 battery on that checkpoint:
#   1. segmentation distill + AP/PQ/F1/mIoU (the family's segm row)
#   2. carousel_tex donor (short) + in-family motion-transfer leg
# Then, gate or no gate, the cheap tail probes:
#   3. fixed-slice attribution rerun (bfloat16 crash fixed)
#   4. Mosaic re-probe on the real device (NVFI_TEST_TPU=1)
# Deadline-guarded so the driver's end-of-round bench.py finds the chip free.
set -u
cd /root/repo
LOG=logs
SCENE=logs/synth/chess_arm_tex
DONOR=logs/synth/carousel_tex_donor
GATE=${GATE:-0.9}
DEADLINE=${DEADLINE:-1610}   # UTC HHMM: no new task after this

P=$(cat /tmp/r5_tex.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 20; done
sleep 5
echo "[post-tex] start $(date -u)"

VERDICT=$(python - <<'EOF'
import re
try:
    txt = open("logs/chess_arm_tex_eval.log").read()
    vals = [float(m) for m in re.findall(r"'rel_epe_moving': ([0-9.]+)", txt)]
    print(min(vals) if vals else 99)
except Exception:
    print(99)
EOF
)
echo "[post-tex] tex arm best rel_epe_moving = $VERDICT (gate $GATE)"
PASS=$(python -c "print(1 if $VERDICT < $GATE else 0)")

past() { [ "$(date -u +%H%M)" -ge "$DEADLINE" ]; }
run() {
  if past; then echo "[post-tex] deadline — skipping: $*"; return; fi
  echo "[post-tex] ===== $(date -u +%H:%M:%S) $* ====="
  timeout "${T:-1800}" "$@"
  echo "[post-tex] rc=$? for: $*"
}

if [ "$PASS" = 1 ]; then
  T=2400 run python -u train_segm.py --config configs/synth/chessboard_tex.yaml \
    --scene_dir "$SCENE" > $LOG/segm_train_tex_r5.log 2>&1
  tail -3 $LOG/segm_train_tex_r5.log | sed 's/^/[post-tex segm-train] /'
  T=2400 run python -u test_segm_render.py --config configs/synth/chessboard_tex.yaml \
    --synthetic --scene_dir "$SCENE" --export_points 48 \
    > $LOG/segm_render_tex_r5.log 2>&1
  grep -E "AP|PQ|F1|mIoU|RI" $LOG/segm_render_tex_r5.log | tail -4 | sed 's/^/[post-tex segm] /'

  T=2700 run python -u train_nvfi.py --config configs/synth/carousel_tex.yaml --synthetic \
    --synth_res 64 --synth_frames 48 --static_dynamic --logdir "$DONOR" \
    nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
    experiment.train_iters 2000 nvfi.upsamp_list "[300, 600]" \
    experiment.print_every 200 experiment.save_every 500 \
    experiment.validate_every 100000 \
    > $LOG/carousel_tex_donor_r5.log 2>&1
  tail -2 $LOG/carousel_tex_donor_r5.log | sed 's/^/[post-tex donor] /'
  T=2400 run python -u test_transfer_vel.py --config configs/synth/chessboard_tex.yaml \
    --config2 configs/synth/carousel_tex.yaml --synthetic \
    --scene_dir "$SCENE" --scene_dir2 "$DONOR" \
    > $LOG/transfer_tex_r5.log 2>&1
  tail -8 $LOG/transfer_tex_r5.log | sed 's/^/[post-tex transfer] /'
else
  echo "[post-tex] gate failed — recording the negative and running tail probes"
fi

T=1800 run python -u scripts/r5_fixed_slice.py > $LOG/fixed_slice_r5b.log 2>&1
tail -12 $LOG/fixed_slice_r5b.log | sed 's/^/[post-tex slice] /'
T=1200 run env NVFI_TEST_TPU=1 python -m pytest tests/test_mosaic_probe.py -q -s \
  > $LOG/mosaic_probe_r5b.log 2>&1
tail -4 $LOG/mosaic_probe_r5b.log | sed 's/^/[post-tex mosaic] /'
echo "[post-tex] ALL DONE $(date -u)"
