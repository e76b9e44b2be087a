#!/bin/bash
# Waits for the parity2 reference training (CPU, PID in /tmp/ref_run.pid or
# discovered from the converged_compare driver) to finish, then runs the
# reference-side eval.  The final table phase needs ours_eval.json too, so it
# only runs when both eval artifacts exist.
set -u
cd /root/repo
LOG=/root/repo/logs

REFPID=$(cat /tmp/ref_run.pid 2>/dev/null || true)
echo "[ref_post] waiting on pid $REFPID at $(date)"
while kill -0 "$REFPID" 2>/dev/null; do sleep 60; done
echo "[ref_post] ref training done at $(date)"

timeout 5400 python -u scripts/converged_compare.py --phase ref_eval \
    > $LOG/parity2_ref_eval.log 2>&1
echo "[ref_post] ref_eval rc=$? at $(date)"

for i in $(seq 1 240); do
  if [ -f logs/parity2/ours_eval.json ] && [ -f logs/parity2/ref_eval.json ]; then
    timeout 600 python -u scripts/converged_compare.py --phase table \
        > $LOG/parity2_table.log 2>&1
    echo "[ref_post] table rc=$? at $(date)"
    break
  fi
  sleep 60
done
echo "[ref_post] done at $(date)"
