#!/bin/bash
# Round-4b tail queue (post machine-reset relaunch).  The supervised
# chessboard 30k trainer (pid in /tmp/chess30k.pid) holds the TPU; when it
# exits this queue runs, in priority order:
#
#   1. quality battery on the sur-gated scene — eval renders + velocity EPE
#      + segm distill + segm metrics (VERDICT r3 item 3's "Done =" evidence)
#   2. gather_fuse real-chip probe — benched default vs nvfi.gather_fuse true
#      (docs/pallas_decision.md §5 lever (b): one 6P-index gather vs six
#      gather ops, bit-identical math, tests/test_gather_fuse.py)
#   3. stretch extrapolation arms: velocity-MLP capacity (arm D) and the
#      eval-time RK2 dt probe on the chessboard checkpoint
#
# ONE TPU process at a time; every task is timeout-bounded and no new task
# starts past DEADLINE so the driver's end-of-round bench.py finds the chip
# free.
set -u
cd /root/repo
LOG=logs
SCENE=logs/synth/chessboard30k
TRAIN_PID=$(cat /tmp/chess30k.pid 2>/dev/null)
DEADLINE=${DEADLINE:-2230}   # UTC HHMM

past_deadline() { [ "$(date -u +%H%M)" -ge "$DEADLINE" ]; }

while [ -n "$TRAIN_PID" ] && kill -0 "$TRAIN_PID" 2>/dev/null; do
  past_deadline && { echo "[post] deadline before training finished"; exit 0; }
  sleep 60
done
sleep 30   # let the trainer's final checkpoint / gif writes settle
echo "[post] trainer exited; TPU free at $(date -u)"

run() {
  if past_deadline; then echo "[post] deadline — skipping: $*"; return; fi
  echo "[post] ===== $(date -u +%H:%M:%S) $* ====="
  timeout "${T:-1800}" "$@"
  echo "[post] rc=$? for: $*"
}

T=7200 run python -u scripts/eval_all.py --scene_dir "$SCENE" --res 96 --frames 96 \
  > $LOG/eval_all_chess.log 2>&1
echo "[post] eval_all done at $(date -u)"
T=5400 run python -u train_segm.py --config configs/synth/chessboard.yaml \
  --scene_dir "$SCENE" > $LOG/segm_train_chess.log 2>&1
T=5400 run python -u test_segm_render.py --config configs/synth/chessboard.yaml \
  --synthetic --scene_dir "$SCENE" --export_points 48 \
  > $LOG/segm_render_chess.log 2>&1
echo "[post] segm battery done at $(date -u)"

T=1200 run python -u bench.py 8192 > $LOG/bench_fuse_off.log 2>&1
T=1200 run python -u bench.py 8192 nvfi.gather_fuse true > $LOG/bench_fuse_on.log 2>&1
echo "[post] gather_fuse probe done at $(date -u)"

T=2400 run python -u scripts/extrap_ablate.py --arms D --iters 4000 \
  --out logs/extrap_ablate_r4.json > $LOG/extrap_ablate_D.log 2>&1
T=2400 run python -u scripts/extrap_dt_probe.py --scene_dir "$SCENE" \
  --config configs/synth/chessboard.yaml --res 96 --frames 96 \
  --out logs/extrap_dt_probe_chess.json > $LOG/extrap_dt_probe_chess.log 2>&1
echo "[post] ALL DONE at $(date -u)"
