#!/usr/bin/env bash
# Round-5 headline: the hard-kd arxiv-shaped task — hierarchical classes
# (8 superclasses x 5 confusable subclasses), sibling-structured label
# noise, feature-sparse nodes. This is the task family where teacher soft
# targets carry real dark knowledge (inter-class similarity), unlike the
# flat-prototype task whose equidistant classes provably gave KD nothing to
# transfer (RESULTS.md round-5 findings; CPU probes in logs/r5/).
# KD temperature is validation-tuned on THIS task (the reference tunes
# tau1 per task too, arxiv_pyg/scripts/run_gcn.sh header); the teacher's
# logit scale here makes T=4 near-uniform mush, T in {1,2} informative.
set -euo pipefail
OUT=logs/results
TASK_T="--num-nodes 169343 --num-edges 1166243 --signal 0.35 --label-noise 0.25 --feat-sparse 0.3 --n-super 8 --sub-scale 0.4"
TASK_S="--num_nodes 169343 --num_edges 1166243 --signal 0.35 --label_noise 0.25 --feat_sparse 0.3 --n_super 8 --sub_scale 0.4"
TD=$OUT/teacher_dumps/gat-3L250x3h-hkd
COMMON="$TASK_S --runs 5 --epochs 300 --epoch_chunk 100 --log_steps 100 --expt_name hard-kd --out_dir $OUT"
KD_T=${KD_T:-2}

python -m efficient_gnns_tpu.cli.gat_teacher \
  --dataset synthetic $TASK_T \
  --use-labels --n-label-iters 1 --no-attn-dst --use-norm \
  --edge-drop 0.3 --input-drop 0.25 \
  --n-epochs 500 --n-runs 5 --seed 0 \
  --epoch-chunk 100 --log-every 100 \
  --save-pred --dump-labels self \
  --expt-name gat-3L250x3h-hkd --out-dir $OUT

run() { python -m efficient_gnns_tpu.cli.arxiv "$@"; }
run --gnn gcn --training supervised $COMMON
run --gnn gcn --training kd --alpha 0.9 --kd_T $KD_T --teacher_dir $TD $COMMON
run --gnn gcn --training nce --beta 0.05 --nce_T 0.075 --proj_dim 256 \
    --max_samples 16384 --teacher_dir $TD $COMMON
run --gnn gcn --training nce --kd_and_aux --alpha 0.9 --kd_T $KD_T \
    --beta 0.01 --nce_T 0.075 --proj_dim 256 --max_samples 16384 \
    --teacher_dir $TD $COMMON
run --gnn sage --training supervised $COMMON
run --gnn sage --training kd --alpha 0.9 --kd_T $KD_T --teacher_dir $TD $COMMON
