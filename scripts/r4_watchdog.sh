#!/bin/bash
# Round-4 training supervisor: watches the 30k shade-0.125 run for
# axon-tunnel wedges (log stale >12 min with the trainer alive — observed
# twice in round 3), kills the exact PIDs and resumes from the latest
# checkpoint; when training completes it runs the post-training evaluation
# queue exactly once.
LOG=/root/repo/logs/bat30k_s125.log
cd /root/repo

restart_train() {
  N=$(cat /tmp/train30k_r4.restarts 2>/dev/null || echo 0)
  N=$((N + 1)); echo $N > /tmp/train30k_r4.restarts
  if [ "$N" -gt 5 ]; then
    echo "[watchdog] restart cap hit at $(date); going to post-queue" >> logs/watchdog_r4.log
    nohup bash scripts/r4_queue_post.sh > logs/r4_queue_post.log 2>&1 &
    echo $! > /tmp/queue_r4.pid
    exit 1
  fi
  echo "[watchdog] restart #$N with --resume at $(date)" >> logs/watchdog_r4.log
  nohup python -u train_nvfi.py --config configs/synth/bat.yaml --synthetic \
    --synth_res 128 --synth_frames 128 --static_dynamic --resume \
    --logdir logs/synth/bat30k_s125 nvfi.compute_dtype bfloat16 \
    renderer.batch_size 262144 nvfi.turbo true \
    nvfi.update_AlphaMask_list "[2000, 4000]" \
    nvfi.shade_fraction 0.125 \
    experiment.print_every 100 experiment.save_every 2500 \
    >> "$LOG" 2>&1 &
  echo $! > /tmp/train30k_r4.pid
}

while true; do
  sleep 120
  TP=$(cat /tmp/train30k_r4.pid 2>/dev/null)
  if [ -n "$TP" ] && kill -0 "$TP" 2>/dev/null; then
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt 720 ]; then
      echo "[watchdog] stall ${AGE}s at $(date), killing $TP" >> logs/watchdog_r4.log
      CHILD=$(pgrep -P "$TP")
      kill "$TP" $CHILD 2>/dev/null; sleep 5
      kill -9 "$TP" $CHILD 2>/dev/null; sleep 10
      restart_train
    fi
    continue
  fi
  # trainer process gone: finished or crashed
  if grep -q "it=29999\|it=29900" "$LOG" 2>/dev/null; then
    if [ ! -f /tmp/queue_r4.pid ]; then
      echo "[watchdog] training complete at $(date)" >> logs/watchdog_r4.log
      nohup bash scripts/r4_queue_post.sh > logs/r4_queue_post.log 2>&1 &
      echo $! > /tmp/queue_r4.pid
    fi
    exit 0
  fi
  # crashed before completion: resume
  if [ -n "$TP" ]; then
    echo "[watchdog] trainer died at $(date)" >> logs/watchdog_r4.log
    restart_train
  fi
done
