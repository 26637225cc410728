#!/usr/bin/env bash
# Remainder of the round-5 arxiv student matrix (continuation of
# r5_students.sh after a preemption — completed configs are skipped by
# checking for their result JSONs).
set -euo pipefail
OUT=logs/results
SHAPE="--num_nodes 169343 --num_edges 1166243 --signal 0.3 --label_noise 0.15"
TD=$OUT/teacher_dumps/gat-3L250x3h-hard-r5
COMMON="$SHAPE --runs 5 --epochs 300 --epoch_chunk 100 --log_steps 100 --expt_name hard-r5 --out_dir $OUT"

run() {
  local out_json="$1"; shift
  if [ -f "$OUT/$out_json" ]; then echo "skip $out_json (exists)"; return; fi
  python -m efficient_gnns_tpu.cli.arxiv "$@"
}

run hard-r5-gcn-supervised.json --gnn gcn --training supervised $COMMON
run hard-r5-gcn-kd.json --gnn gcn --training kd --alpha 0.9 --kd_T 4 --teacher_dir $TD $COMMON
run hard-r5-gcn-nce.json --gnn gcn --training nce --beta 0.05 --nce_T 0.075 \
    --proj_dim 256 --max_samples 16384 --teacher_dir $TD $COMMON
run hard-r5-gcn-kd+nce.json --gnn gcn --training nce --kd_and_aux --alpha 0.9 --kd_T 4 \
    --beta 0.01 --nce_T 0.075 --proj_dim 256 --max_samples 16384 --teacher_dir $TD $COMMON
run hard-r5-gcn-fitnet.json --gnn gcn --training fitnet --beta 1000 --teacher_dir $TD $COMMON
run hard-r5-gcn-at.json --gnn gcn --training at --beta 100000 --teacher_dir $TD $COMMON
run hard-r5-gcn-gpw.json --gnn gcn --training gpw --beta 100 --kernel cosine \
    --max_samples 4096 --proj_dim 128 --teacher_dir $TD $COMMON
run hard-r5-gcn-lpw.json --gnn gcn --training lpw --beta 100 --kernel cosine \
    --max_samples 4096 --proj_dim 128 --teacher_dir $TD $COMMON
run hard-r5-gcn-gcd.json --gnn gcn --training gcd --beta 0.05 --nce_T 0.075 \
    --proj_dim 256 --max_samples 16384 --teacher_dir $TD $COMMON
run hard-r5-gcn-kd+fitnet.json --gnn gcn --training fitnet --kd_and_aux --beta 100 --teacher_dir $TD $COMMON
run hard-r5-gcn-kd+at.json --gnn gcn --training at --kd_and_aux --beta 10000 --teacher_dir $TD $COMMON
run hard-r5-gcn-kd+gpw.json --gnn gcn --training gpw --kd_and_aux --beta 10 --kernel cosine \
    --max_samples 4096 --proj_dim 128 --teacher_dir $TD $COMMON
run hard-r5-gcn-kd+lpw.json --gnn gcn --training lpw --kd_and_aux --beta 100 --kernel cosine \
    --max_samples 4096 --proj_dim 128 --teacher_dir $TD $COMMON
run hard-r5-sage-supervised.json --gnn sage --training supervised $COMMON
run hard-r5-sage-kd.json --gnn sage --training kd --alpha 0.9 --kd_T 4 --teacher_dir $TD $COMMON
