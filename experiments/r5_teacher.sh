#!/usr/bin/env bash
# Round-5 GAT teacher: 5 seeds, de-noised ('self' label-mode) dumps.
# Same hardened arxiv-shaped task as round 4 (signal 0.3, label_noise 0.15)
# but the artifact dump no longer feeds true train labels, so the planted
# label noise cannot leak into the students' KD targets
# (reference dump capture: arxiv_dgl/gat.py:243-258).
set -euo pipefail
OUT=logs/results
SHAPE="--num-nodes 169343 --num-edges 1166243 --signal 0.3 --label-noise 0.15"

python -m efficient_gnns_tpu.cli.gat_teacher \
  --dataset synthetic $SHAPE \
  --use-labels --n-label-iters 1 --no-attn-dst --use-norm \
  --edge-drop 0.3 --input-drop 0.25 \
  --n-epochs 500 --n-runs 5 --seed 0 \
  --epoch-chunk 100 --log-every 100 \
  --save-pred --dump-labels self \
  --expt-name gat-3L250x3h-hard-r5 --out-dir $OUT
