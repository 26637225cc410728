#!/usr/bin/env bash
# Real-data-pathway rehearsal at REAL scale (VERDICT r4 item 7): push a
# full-size fake cache (exact on-disk formats, real shapes) through every
# real-data loader and one short training run, so a mounted real cache is a
# drop-in. Generate caches first:
#   python experiments/make_fake_caches.py --root dataset_fake
set -euo pipefail
OUT=logs/results

# ogbn-arxiv: 169,343 x 128 csv.gz -> pd.read_csv -> build_graph -> epochs
python -m efficient_gnns_tpu.cli.arxiv --dataset ogbn-arxiv \
  --data_root dataset_fake --gnn gcn --training supervised \
  --runs 1 --epochs 5 --epoch_chunk 5 --log_steps 1 \
  --expt_name realscale --out_dir $OUT

# PPI: 24-graph node-link json + npy triplets
python -m efficient_gnns_tpu.cli.ppi --dataset ppi \
  --data_root dataset_fake/ppi --gnn student --training supervised \
  --runs 1 --epochs 3 --expt_name realscale --out_dir $OUT

# ogbg-molhiv: 41,127 molecules csv.gz + scaffold splits
python -m efficient_gnns_tpu.cli.mol --dataset ogbg-molhiv \
  --data_root dataset_fake --gnn gcn --training supervised \
  --runs 1 --epochs 2 --expt_name realscale --out_dir $OUT
