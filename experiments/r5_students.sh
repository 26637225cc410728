#!/usr/bin/env bash
# Round-5 arxiv student matrix vs the de-noised ('self' label-mode) teacher
# dumps — every mode column of the reference's results table
# (arxiv_pyg/scripts/run_gcn.sh + run_kd_and_aux.sh grid points, tuned
# hyperparameters from those scripts), 5 seeds each.
set -euo pipefail
OUT=logs/results
SHAPE="--num_nodes 169343 --num_edges 1166243 --signal 0.3 --label_noise 0.15"
TD=$OUT/teacher_dumps/gat-3L250x3h-hard-r5
COMMON="$SHAPE --runs 5 --epochs 300 --epoch_chunk 100 --log_steps 100 --expt_name hard-r5 --out_dir $OUT"

run() { python -m efficient_gnns_tpu.cli.arxiv "$@"; }

# headline four (supervised / kd / G-CRD / kd+G-CRD)
run --gnn gcn --training supervised $COMMON
run --gnn gcn --training kd --alpha 0.9 --kd_T 4 --teacher_dir $TD $COMMON
run --gnn gcn --training nce --beta 0.05 --nce_T 0.075 --proj_dim 256 \
    --max_samples 16384 --teacher_dir $TD $COMMON
run --gnn gcn --training nce --kd_and_aux --alpha 0.9 --kd_T 4 \
    --beta 0.01 --nce_T 0.075 --proj_dim 256 --max_samples 16384 \
    --teacher_dir $TD $COMMON

# aux-replacing modes (alpha=0 semantics; reference run_gcn.sh betas)
run --gnn gcn --training fitnet --beta 1000 --teacher_dir $TD $COMMON
run --gnn gcn --training at --beta 100000 --teacher_dir $TD $COMMON
run --gnn gcn --training gpw --beta 100 --kernel cosine --max_samples 4096 \
    --proj_dim 128 --teacher_dir $TD $COMMON
run --gnn gcn --training lpw --beta 100 --kernel cosine --max_samples 4096 \
    --proj_dim 128 --teacher_dir $TD $COMMON
run --gnn gcn --training gcd --beta 0.05 --nce_T 0.075 --proj_dim 256 \
    --max_samples 16384 --teacher_dir $TD $COMMON

# KD+aux composites (reference run_kd_and_aux.sh betas)
run --gnn gcn --training fitnet --kd_and_aux --beta 100 --teacher_dir $TD $COMMON
run --gnn gcn --training at --kd_and_aux --beta 10000 --teacher_dir $TD $COMMON
run --gnn gcn --training gpw --kd_and_aux --beta 10 --kernel cosine \
    --max_samples 4096 --proj_dim 128 --teacher_dir $TD $COMMON
run --gnn gcn --training lpw --kd_and_aux --beta 100 --kernel cosine \
    --max_samples 4096 --proj_dim 128 --teacher_dir $TD $COMMON

# SAGE students
run --gnn sage --training supervised $COMMON
run --gnn sage --training kd --alpha 0.9 --kd_T 4 --teacher_dir $TD $COMMON
