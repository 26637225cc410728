#!/usr/bin/env bash
# PPI student mode set (resume-safe: skips configs whose JSON exists).
set -euo pipefail
OUT=logs/results
PT=$OUT/ppi_teacher/hard-r5

skip() { [ -f "$OUT/$1" ] && { echo "skip $1"; return 0; } || return 1; }

skip ppi-hard-r5-student-supervised.json || \
python -m efficient_gnns_tpu.cli.ppi --gnn student --training supervised \
  --runs 5 --epochs 100 --expt_name hard-r5 --out_dir $OUT
for mode in nce kd fitnet at lpw; do
  skip ppi-hard-r5-student-$mode.json || \
  python -m efficient_gnns_tpu.cli.ppi --gnn student --training $mode \
    --teacher_path $PT --runs 5 --epochs 100 \
    --expt_name hard-r5 --out_dir $OUT
done
