#!/bin/bash
# Round-4 bench sweep (one TPU process at a time; caller guarantees the chip
# is free).  Measures, on the real chip with the committed bench protocol:
#   a) default        — shade 0.25, SB 64, shade_reuse ON (item-2 gain vs r3)
#   b) shade 0.125    — the quality run in flight certifies this config
#   c) b + SB 32      — finer block granularity (exactness-certified by the
#   d) b + SB 16        bench's dropped==0 assert; no quality run needed)
#   e) shade_reuse off — round-3 re-gather path, isolates the reuse gain
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
sweep s125       nvfi.shade_fraction 0.125
sweep s125_sb32  nvfi.shade_fraction 0.125 nvfi.sample_block 32
sweep s125_sb16  nvfi.shade_fraction 0.125 nvfi.sample_block 16
sweep noreuse    nvfi.shade_reuse False
echo "[sweep] DONE at $(date)"
