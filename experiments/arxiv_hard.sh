#!/usr/bin/env bash
# Full teacher->dump->student distillation pipeline at ogbn-arxiv shape on
# the hardened synthetic task (signal 0.3, label_noise 0.15 — real-OGB
# parity awaits a pre-mounted data cache; same CLIs take
# --dataset ogbn-arxiv). Mirrors the reference sweep scripts
# (arxiv_dgl/scripts/gat-teachers.sh + arxiv_pyg/scripts/run_gcn.sh).
# Results land under logs/results; render RESULTS.md with:
#   python -m efficient_gnns_tpu.cli.results --dir logs/results
set -euo pipefail

OUT=logs/results
SHAPE="--num-nodes 169343 --num-edges 1166243 --signal 0.3 --label-noise 0.15"
SHAPE_U="--num_nodes 169343 --num_edges 1166243 --signal 0.3 --label_noise 0.15"
TEACHER_DIR=$OUT/teacher_dumps/gat-3L250x3h-hard

# 1) GAT teacher (reference flags, arxiv_dgl/scripts/gat-teachers.sh), 3 seeds
python -m efficient_gnns_tpu.cli.gat_teacher \
  --dataset synthetic $SHAPE \
  --use-labels --n-label-iters 1 --no-attn-dst --use-norm \
  --edge-drop 0.3 --input-drop 0.25 \
  --n-epochs 500 --n-runs 3 --seed 0 \
  --epoch-chunk 100 --log-every 100 \
  --save-pred --expt-name gat-3L250x3h-hard --out-dir $OUT

# 2) students (reference arxiv_pyg/scripts/run_gcn.sh grid points), 3 seeds
for gnn in gcn sage; do
  python -m efficient_gnns_tpu.cli.arxiv --gnn $gnn --training supervised \
    $SHAPE_U --runs 3 --epochs 300 --epoch_chunk 100 --log_steps 100 \
    --expt_name hard --out_dir $OUT
  python -m efficient_gnns_tpu.cli.arxiv --gnn $gnn --training kd \
    --alpha 0.9 --kd_T 4 --teacher_dir $TEACHER_DIR \
    $SHAPE_U --runs 3 --epochs 300 --epoch_chunk 100 --log_steps 100 \
    --expt_name hard --out_dir $OUT
done
python -m efficient_gnns_tpu.cli.arxiv --gnn gcn --training nce \
  --beta 0.05 --nce_T 0.075 --proj_dim 256 --teacher_dir $TEACHER_DIR \
  $SHAPE_U --runs 3 --epochs 300 --epoch_chunk 100 --log_steps 100 \
  --expt_name hard --out_dir $OUT
python -m efficient_gnns_tpu.cli.arxiv --gnn gcn --training nce --kd_and_aux \
  --alpha 0.9 --kd_T 4 --beta 0.05 --nce_T 0.075 --proj_dim 256 \
  --teacher_dir $TEACHER_DIR \
  $SHAPE_U --runs 3 --epochs 300 --epoch_chunk 100 --log_steps 100 \
  --expt_name hard --out_dir $OUT
