#!/bin/bash
# Round-4 bench sweep (one TPU process at a time; caller guarantees the chip
# is free).  Measures, on the real chip with the committed bench protocol:
#   a) default        — shade 0.25, SB 64, shade_reuse ON (item-2 gain vs r3)
#   b) SB 32          — finer block granularity at the CERTIFIED shade 0.25
#   c) SB 16            (exactness-certified by the bench's dropped==0
#                        assert; no quality run needed)
#   d) shade_reuse off — round-3 re-gather path, isolates the reuse gain
#   e) shade 0.125    — for the record: its 30k quality run FAILED the 0.5 dB
#                       gate (test 20.66 vs dense 21.73, logs/eval_all_30k_s125.log),
#                       so this config is NOT the benched one
# Each line of logs/bench_sweep_r4.jsonl: {"tag": ..., <bench JSON>}.
set -u
cd /root/repo
OUT=logs/bench_sweep_r4.jsonl
: > "$OUT"

sweep() {
  tag=$1; shift
  echo "[sweep] $(date +%H:%M:%S) $tag: bench.py 8192 $*"
  line=$(timeout 1800 python bench.py 8192 "$@" 2>logs/bench_sweep_${tag}.err)
  rc=$?
  if [ $rc -eq 0 ] && [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", ${line#\{}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"error\": $rc}" >> "$OUT"
  fi
  tail -1 "$OUT"
}

sweep default
sweep sb32       nvfi.sample_block 32
sweep sb16       nvfi.sample_block 16
sweep noreuse    nvfi.shade_reuse False
sweep s125       nvfi.shade_fraction 0.125
echo "[sweep] DONE at $(date)"
