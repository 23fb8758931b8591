#!/usr/bin/env bash
# TPU-native analogue of the reference launch (src/train_albef.sh):
# federated DAT over the "domain" clients with ALBEF (no momentum distill).
set -euo pipefail
python -m feddat_tpu.cli \
  --encoder_name albef_no_distill \
  --pretrained_model_name "${ALBEF_CHECKPOINT:-}" \
  --vocab_file "${BERT_VOCAB:-}" \
  --climb_data_dir "${DATA_DIR:-./data}" \
  --output_dir ./logs \
  --do_train \
  --batch_size 2 \
  --val_batch_size 2 \
  --lr 1e-4 \
  --optimizer_mode dat \
  --seed 2 \
  --adapter_reduction_factor 16 \
  --adapter_config pfeiffer \
  --splits train_small val test \
  --ordered_cl_tasks domain \
  "$@"
