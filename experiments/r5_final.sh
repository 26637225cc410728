#!/usr/bin/env bash
# Round-5 final TPU triage queue: reduced molhiv grid + PPI mode set at
# 3 seeds (wall-clock budget; resume-safe via skip()).
set -euo pipefail
OUT=logs/results

skip() { [ -f "$OUT/$1" ] && { echo "skip $1"; return 0; } || return 1; }

MOL="--n_train 1500 --n_valid 250 --n_test 250 --runs 3 --batch_size 128 --expt_name hard-r5 --out_dir $OUT"
skip mol-hard-r5-pna-supervised.json || \
python -m efficient_gnns_tpu.cli.mol --gnn pna --training supervised \
  --hidden_channels 300 --num_layers 5 --epochs 40 $MOL
for student in gcn gin; do
  skip mol-hard-r5-$student-supervised.json || \
  python -m efficient_gnns_tpu.cli.mol --gnn $student --training supervised \
    --hidden_channels 64 --num_layers 2 --epochs 25 $MOL
done
for cell in "gcn kd gine" "gcn nce gine" "gin kd pna" "gin nce pna"; do
  set -- $cell
  skip mol-hard-r5-$1-$2-from-$3.json || \
  python -m efficient_gnns_tpu.cli.mol --gnn $1 --training $2 \
    --teacher_gnn $3 --teacher_path $OUT/mol_ckpt/hard-r5/$3 \
    --teacher_hidden 300 --teacher_layers 5 \
    --hidden_channels 64 --num_layers 2 --epochs 25 $MOL
done

PT=$OUT/ppi_teacher/hard-r5
skip ppi-hard-r5-student-supervised.json || \
python -m efficient_gnns_tpu.cli.ppi --gnn student --training supervised \
  --runs 3 --epochs 100 --expt_name hard-r5 --out_dir $OUT
for mode in nce kd fitnet at lpw; do
  skip ppi-hard-r5-student-$mode.json || \
  python -m efficient_gnns_tpu.cli.ppi --gnn student --training $mode \
    --teacher_path $PT --runs 3 --epochs 100 \
    --expt_name hard-r5 --out_dir $OUT
done
