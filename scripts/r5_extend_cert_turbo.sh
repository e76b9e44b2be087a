#!/bin/bash
# Round-5 tail v2: extend the sur-family certification past 12k in TURBO
# mode.  The dense v1 plan was obsoleted by the A/B measurement on this
# exact checkpoint (logs/sur_turbo_ab_r5.log): dense 0.912 s/it vs turbo
# 0.325 s/it = 2.80x, with exact shading (shade_follow_probe) and healthy
# training prints through the alpha event.  At turbo speed the owed
# long-horizon trajectory (bat precedent: EPE 0.62@4k -> 0.35@30k) fits
# comfortably before the deadline: 6-8k-iter segments, orbit+heldout eval
# after each.  Evals are ALWAYS dense-exact (turbo budgets stripped by
# kplane.eval_exact_meta), so the metric tables are unaffected by the mode.
#
# The alpha event fires once at 12010 (first segment); later segments
# resume with the event already consumed and re-probe turbo budgets from
# the checkpointed alpha state (trainer resume path).
set -u
cd /root/repo
LOG=logs
CERT=logs/synth/chess_slow_cert
HARD_STOP=$(date -ud "2026-08-20 05:45" +%s)

# wait for the in-flight s0 heldout eval the killed v1 script left running
while ps -p "${WAIT_PID:-10154}" > /dev/null 2>&1; do sleep 20; done
sleep 5
echo "[ext2] start $(date -u)"

run() {
  echo "[ext2] ===== $(date -u +%H:%M:%S) $* ====="
  timeout "${T:-3600}" "$@"
  echo "[ext2] rc=$? for: $*"
}

fits() { [ $(( $(date +%s) + $1 )) -lt "$HARD_STOP" ]; }

heldout_eval() { # heldout_eval <step> <tag>
  T=1800 run python -u scripts/eval_all.py --scene_dir "$CERT" \
    --checkpoint "$1" --protocol heldout --res 64 --frames 48 \
    > "$LOG/chess_slow_cert_eval_${2}_heldout.log" 2>&1
  grep -E "interpolation|aggregate" "$LOG/chess_slow_cert_eval_${2}_heldout.log" \
    | sed "s/^/[ext2-$2-heldout] /"
}

# owed protocol-matched PSNR rows for the already-run segments (s0 was
# covered by the v1 script's eval before the switch)
fits 2400 && heldout_eval 6999 s1
fits 2400 && heldout_eval 11999 s2

seg() { # seg <train_iters> <tag>
  need=$(( $1 - LAST ))
  # 0.37 s/it turbo (+ margin) + 900 s compile + 2 evals
  fits $(( need * 45 / 100 + 900 + 1500 )) || { echo "[ext2] skip seg $2 (deadline)"; return 1; }
  T=9000 run python -u train_nvfi.py \
    --config configs/synth/chessboard_slow.yaml --synthetic \
    --synth_res 64 --synth_frames 48 --static_dynamic \
    --resume --supervise --stall_timeout 1800 --logdir "$CERT" \
    nvfi.compute_dtype bfloat16 renderer.batch_size 262144 \
    experiment.train_iters "$1" experiment.lr_decay_iters "$1" \
    nvfi.upsamp_list "[300, 600]" \
    nvfi.update_AlphaMask_list "[12010]" nvfi.turbo true \
    nvfi.sample_block 16 nvfi.shade_follow_probe true \
    experiment.print_every 200 experiment.save_every 1000 \
    experiment.validate_every 100000 \
    > "$LOG/chess_slow_cert_$2.log" 2>&1
  T=1800 run python -u scripts/eval_all.py --scene_dir "$CERT" \
    --res 64 --frames 48 > "$LOG/chess_slow_cert_eval_$2.log" 2>&1
  grep -E "interpolation|velocity|advection" "$LOG/chess_slow_cert_eval_$2.log" \
    | sed "s/^/[ext2-$2] /"
  heldout_eval $(( $1 - 1 )) "$2"
  LAST=$1
}

LAST=12000
seg 18000 s3
seg 24000 s4
seg 30000 s5
seg 36000 s6
seg 42000 s7

echo "[ext2] ALL DONE $(date -u)"
