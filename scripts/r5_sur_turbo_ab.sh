#!/bin/bash
# Sur-family throughput mode A/B (VERDICT r4 weak #4): measure dense vs
# turbo s/it on the SAME converged chess_slow_cert checkpoint.  Chains
# behind the certification queue (one TPU process at a time).
#
# Both legs resume the identical checkpoint into a scratch dir and run +350
# iters; leg B fires the alpha event 10 steps in (occupancy build + shrink +
# block-sparse engage, shading kept exact via shade_follow_probe).  s/it is
# read from the [train] print deltas AFTER the event so compile time and
# the event itself are excluded.
set -u
cd /root/repo
LOG=logs
CERT=logs/synth/chess_slow_cert
AB=logs/synth/chess_slow_turbo_ab

P=$(cat /tmp/r5_cert.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
sleep 10
echo "[ab] start $(date -u)"

STEP=$(python - <<'EOF'
import glob, os, re
ck = sorted(glob.glob("logs/synth/chess_slow_cert/model_*.npz"))
print(int(re.search(r"model_(\d+)", ck[-1]).group(1)) + 1 if ck else 0)
EOF
)
if [ "$STEP" -lt 3000 ]; then
  echo "[ab] cert checkpoint too early (step $STEP) — aborting"; exit 0
fi
END=$((STEP + 350))
EVENT=$((STEP + 10))
echo "[ab] resume step=$STEP -> $END, turbo event @ $EVENT"

leg() { # leg <tag> <extra config args...>
  tag=$1; shift
  rm -rf "$AB"; cp -a "$CERT" "$AB"
  echo "[ab] ===== leg $tag $(date -u +%H:%M:%S) ====="
  timeout 4500 python -u train_nvfi.py \
    --config configs/synth/chessboard_slow.yaml --synthetic \
    --synth_res 64 --synth_frames 48 --static_dynamic \
    --resume --logdir "$AB" \
    nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
    experiment.train_iters "$END" experiment.lr_decay_iters 12000 \
    nvfi.upsamp_list "[300, 600]" \
    experiment.print_every 50 experiment.save_every 1000000 \
    experiment.validate_every 100000 "$@" \
    > "$LOG/sur_turbo_ab_$tag.log" 2>&1
  echo "[ab] leg $tag rc=$?"
  grep -E "\[train\]|\[turbo\]" "$LOG/sur_turbo_ab_$tag.log" | tail -8 | sed "s/^/[ab-$tag] /"
}

leg dense
leg turbo nvfi.update_AlphaMask_list "[$EVENT]" nvfi.turbo true \
  nvfi.sample_block 16 nvfi.shade_follow_probe true

python - <<EOF | tee -a $LOG/sur_turbo_ab_r5.log
import re
def sit(path, after):
    rows = [(int(m.group(1)), float(m.group(2))) for m in
            re.finditer(r"it=(\d+).*\((\d+(?:\.\d+)?)s\)", open(path).read())]
    rows = [r for r in rows if r[0] >= after]
    if len(rows) < 2:
        return None
    return (rows[-1][1] - rows[0][1]) / (rows[-1][0] - rows[0][0])
d = sit("logs/sur_turbo_ab_dense.log", $STEP + 60)
t = sit("logs/sur_turbo_ab_turbo.log", $EVENT + 50)
print(f"[ab] dense s/it = {d}")
print(f"[ab] turbo s/it = {t}")
if d and t:
    print(f"[ab] sur-family turbo speedup = {d/t:.2f}x")
EOF
echo "[ab] ALL DONE $(date -u)"
