#!/usr/bin/env bash
# Round-5 non-arxiv workloads: SIGN (5 seeds), the full PPI mode set,
# molhiv with properly-sized GIN-E + PNA teachers and GCN + GIN students,
# and MAG online-teacher distillation on the hardened generator.
set -euo pipefail
OUT=logs/results
TD=$OUT/teacher_dumps/gat-3L250x3h-hard-r5
SHAPE="--num_nodes 169343 --num_edges 1166243 --signal 0.3 --label_noise 0.15"

# ---- SIGN (arxiv_dgl/sign.py analog), 5 seeds, supervised + kd ----------
python -m efficient_gnns_tpu.cli.sign --training supervised \
  $SHAPE --num_runs 5 --num_epochs 100 --expt_name hard-r5 --out_dir $OUT
python -m efficient_gnns_tpu.cli.sign --training kd --teacher_dir $TD \
  $SHAPE --num_runs 5 --num_epochs 100 --expt_name hard-r5 --out_dir $OUT

# ---- PPI: teacher + every reference mode (ppi_pyg/criterion.py), 5 seeds -
python -m efficient_gnns_tpu.cli.ppi --train_teacher --runs 5 \
  --epochs 100 --expt_name hard-r5 --out_dir $OUT
PT=$OUT/ppi_teacher/hard-r5
python -m efficient_gnns_tpu.cli.ppi --gnn student --training supervised \
  --runs 5 --epochs 100 --expt_name hard-r5 --out_dir $OUT
for mode in kd nce fitnet at lpw; do
  python -m efficient_gnns_tpu.cli.ppi --gnn student --training $mode \
    --teacher_path $PT --runs 5 --epochs 100 \
    --expt_name hard-r5 --out_dir $OUT
done

# ---- molhiv (mol_pyg results-table spec): 2 teachers x 2 students --------
# teachers at reference scale (5L x 300, gine 3.3M / pna 2.4M params);
# 1500-train / 250-valid / 250-test splits (r4: 50-mol splits were noise)
MOL="--n_train 1500 --n_valid 250 --n_test 250 --runs 5 --expt_name hard-r5 --out_dir $OUT"
python -m efficient_gnns_tpu.cli.mol --gnn gine --training supervised \
  --hidden_channels 300 --num_layers 5 --epochs 60 $MOL
python -m efficient_gnns_tpu.cli.mol --gnn pna --training supervised \
  --hidden_channels 300 --num_layers 5 --epochs 60 $MOL
for student in gcn gin; do
  python -m efficient_gnns_tpu.cli.mol --gnn $student --training supervised \
    --hidden_channels 64 --num_layers 2 --epochs 40 $MOL
  for teacher in gine pna; do
    for mode in kd nce; do
      python -m efficient_gnns_tpu.cli.mol --gnn $student --training $mode \
        --teacher_gnn $teacher --teacher_path $OUT/mol_ckpt/hard-r5/$teacher \
        --teacher_hidden 300 --teacher_layers 5 \
        --hidden_channels 64 --num_layers 2 --epochs 40 $MOL
    done
  done
done

# ---- MAG online-teacher distillation on the hardened task ----------------
# (mag_pyg/gnn.py:199-251 columns: kd, kd+lsp, kd+nce; teacher 3L x 512)
MAGSHAPE="--n_paper 10000 --signal 0.3 --label_noise 0.2 --homophily 0.3"
MAGCOM="--batch_size 2500 --num_steps 8 --runs 3 --out_dir $OUT"
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 30 \
  --hidden_channels 512 --num_layers 3 --training supervised \
  --save_ckpt $OUT/mag_ckpt/hard-r5-teacher --expt_name hard-r5-teacher
MT="--teacher_path $OUT/mag_ckpt/hard-r5-teacher --teacher_hidden 512 --teacher_layers 3"
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 30 \
  --training supervised --expt_name hard-r5-student
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 30 \
  --training kd --alpha 0.9 --kd_T 4 $MT --expt_name hard-r5-student
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 30 \
  --training lpw --kd_and_aux --alpha 0.9 --kd_T 4 --beta 100 \
  --kernel cosine $MT --expt_name hard-r5-student
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 30 \
  --training nce --kd_and_aux --alpha 0.9 --kd_T 4 --beta 0.01 \
  --nce_T 0.075 --proj_dim 128 $MT --expt_name hard-r5-student
