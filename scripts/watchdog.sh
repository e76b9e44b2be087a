#!/bin/bash
# Auto-recovery for the 30k training run: if the log stalls >12 min while the
# trainer process is alive (axon tunnel wedge — observed once this round),
# kill the exact PIDs, resume from the latest checkpoint, re-arm the queue.
LOG=/root/repo/logs/bat30k_r2.log
cd /root/repo
while true; do
  sleep 120
  grep -q "ALL DONE" /root/repo/logs/queue.log 2>/dev/null && exit 0
  [ -f /tmp/train30k.pid ] || continue
  TP=$(cat /tmp/train30k.pid)
  kill -0 "$TP" 2>/dev/null || continue
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$AGE" -gt 720 ]; then
    echo "[watchdog] stall ${AGE}s at $(date)" >> /root/repo/logs/watchdog.log
    QP=$(cat /tmp/queue.pid 2>/dev/null); [ -n "$QP" ] && kill "$QP" 2>/dev/null
    CHILD=$(pgrep -P "$TP")
    kill "$TP" $CHILD 2>/dev/null; sleep 5; kill -9 $CHILD 2>/dev/null; sleep 10
    nohup python -u train_nvfi.py --config configs/synth/bat.yaml --synthetic \
      --synth_res 128 --synth_frames 128 --static_dynamic --validate --resume \
      --logdir logs/synth/bat30k_r2 nvfi.compute_dtype bfloat16 \
      renderer.batch_size 262144 experiment.print_every 100 \
      experiment.save_every 2500 \
      >> "$LOG" 2>&1 &
    echo $! > /tmp/train30k.pid
    nohup bash scripts/post_train_queue.sh "$(cat /tmp/train30k.pid)" \
      > /root/repo/logs/queue.log 2>&1 &
    echo $! > /tmp/queue.pid
    echo "[watchdog] restarted pid $(cat /tmp/train30k.pid)" >> /root/repo/logs/watchdog.log
  fi
done
