#!/usr/bin/env bash
# Round-5 workloads remainder, reordered for TPU-time budget: MAG
# online-teacher distillation first (zero prior hardware coverage), then
# the molhiv 2x2 teacher/student grid with a larger batch (fewer relay
# dispatches) and trimmed epochs. Skips any config whose result JSON
# already exists, so it can resume after a preemption.
set -euo pipefail
OUT=logs/results

skip() { [ -f "$OUT/$1" ] && { echo "skip $1"; return 0; } || return 1; }

# ---- MAG online-teacher distillation (mag_pyg/gnn.py:199-251 columns) ----
MAGSHAPE="--n_paper 10000 --signal 0.3 --label_noise 0.2 --homophily 0.3"
MAGCOM="--batch_size 2500 --num_steps 8 --runs 3 --out_dir $OUT"
MT="--teacher_path $OUT/mag_ckpt/hard-r5-teacher --teacher_hidden 512 --teacher_layers 3"
skip mag-hard-r5-teacher-supervised.json || \
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 25 \
  --hidden_channels 512 --num_layers 3 --training supervised \
  --save_ckpt $OUT/mag_ckpt/hard-r5-teacher --expt_name hard-r5-teacher
skip mag-hard-r5-student-supervised.json || \
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 25 \
  --training supervised --expt_name hard-r5-student
skip mag-hard-r5-student-kd.json || \
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 25 \
  --training kd --alpha 0.9 --kd_T 4 $MT --expt_name hard-r5-student
skip mag-hard-r5-student-lpw.json || \
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 25 \
  --training lpw --kd_and_aux --alpha 0.9 --kd_T 4 --beta 100 \
  --kernel cosine $MT --expt_name hard-r5-student
skip mag-hard-r5-student-nce.json || \
python -m efficient_gnns_tpu.cli.mag $MAGSHAPE $MAGCOM --epochs 25 \
  --training nce --kd_and_aux --alpha 0.9 --kd_T 4 --beta 0.01 \
  --nce_T 0.075 --proj_dim 128 $MT --expt_name hard-r5-student

# ---- molhiv 2x2 grid, batch 128 / trimmed epochs ------------------------
MOL="--n_train 1500 --n_valid 250 --n_test 250 --runs 5 --batch_size 128 --expt_name hard-r5 --out_dir $OUT"
skip mol-hard-r5-gine-supervised.json || \
python -m efficient_gnns_tpu.cli.mol --gnn gine --training supervised \
  --hidden_channels 300 --num_layers 5 --epochs 40 $MOL
skip mol-hard-r5-pna-supervised.json || \
python -m efficient_gnns_tpu.cli.mol --gnn pna --training supervised \
  --hidden_channels 300 --num_layers 5 --epochs 40 $MOL
for student in gcn gin; do
  skip mol-hard-r5-$student-supervised.json || \
  python -m efficient_gnns_tpu.cli.mol --gnn $student --training supervised \
    --hidden_channels 64 --num_layers 2 --epochs 30 $MOL
  for teacher in gine pna; do
    for mode in kd nce; do
      skip mol-hard-r5-$student-$mode-from-$teacher.json || \
      python -m efficient_gnns_tpu.cli.mol --gnn $student --training $mode \
        --teacher_gnn $teacher --teacher_path $OUT/mol_ckpt/hard-r5/$teacher \
        --teacher_hidden 300 --teacher_layers 5 \
        --hidden_channels 64 --num_layers 2 --epochs 30 $MOL
    done
  done
done
