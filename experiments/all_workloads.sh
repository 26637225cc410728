#!/usr/bin/env bash
# TPU runs behind RESULTS.md for the non-arxiv workloads (run after
# experiments/arxiv_hard.sh so the teacher dumps exist). Regenerate the
# report with: python -m efficient_gnns_tpu.cli.results --dir logs/results
set -euo pipefail

OUT=logs/results
TEACHER_DIR=$OUT/teacher_dumps/gat-3L250x3h-hard

# SIGN student consuming the GAT teacher dumps (arxiv_dgl/sign.py analog)
python -m efficient_gnns_tpu.cli.sign --training kd --teacher_dir $TEACHER_DIR \
  --num_nodes 169343 --num_edges 1166243 --signal 0.3 --label_noise 0.15 \
  --num_runs 1 --num_epochs 100 --expt_name hard --out_dir $OUT

# PPI: teacher, then supervised + G-CRD students (ppi_pyg analogs)
python -m efficient_gnns_tpu.cli.ppi --train_teacher --runs 1 \
  --epochs 100 --expt_name hard2 --out_dir $OUT
python -m efficient_gnns_tpu.cli.ppi --gnn student --training supervised \
  --runs 1 --epochs 100 --expt_name hard2 --out_dir $OUT
python -m efficient_gnns_tpu.cli.ppi --gnn student --training nce \
  --teacher_path $OUT/ppi_teacher/hard2 --runs 1 --epochs 100 \
  --expt_name hard2 --out_dir $OUT

# molhiv: GIN-E teacher checkpoint, then GCN students (mol_pyg analog —
# code unreleased upstream; built to the results-table spec)
python -m efficient_gnns_tpu.cli.mol --gnn gine --training supervised \
  --runs 1 --epochs 60 --expt_name hard3 --out_dir $OUT
python -m efficient_gnns_tpu.cli.mol --gnn gcn --training supervised \
  --runs 1 --epochs 60 --expt_name hard3 --out_dir $OUT
for mode in nce kd; do
  python -m efficient_gnns_tpu.cli.mol --gnn gcn --training $mode \
    --teacher_path $OUT/mol_ckpt/hard3/gine --teacher_hidden 64 \
    --teacher_layers 2 --runs 1 --epochs 40 --expt_name hard3 --out_dir $OUT
done

# MAG: typed-square vs relation-masked fallback, end-to-end epochs plus
# device-only step time (130.6 ms vs 837.8 ms in RESULTS.md)
python -m efficient_gnns_tpu.cli.mag --runs 1 --epochs 1 \
  --n_paper 200000 --batch_size 20000 --num_steps 5 --time_steps 20 \
  --expt_name steptime-typed --out_dir $OUT
python -m efficient_gnns_tpu.cli.mag --runs 1 --epochs 1 \
  --n_paper 200000 --batch_size 20000 --num_steps 5 --time_steps 20 \
  --no_typed_square --expt_name steptime-fallback --out_dir $OUT
