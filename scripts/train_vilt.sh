#!/usr/bin/env bash
# TPU-native analogue of the reference launch (src/train_vilt.sh): federated
# DAT over the 5 "domain" VQA clients with ViLT-B/32.  accelerate/CUDA env
# vars are replaced by the JAX runtime; multi-chip runs use --engine spmd.
set -euo pipefail
python -m feddat_tpu.cli \
  --encoder_name vilt \
  --pretrained_model_name "${VILT_CHECKPOINT:-}" \
  --vocab_file "${BERT_VOCAB:-}" \
  --climb_data_dir "${DATA_DIR:-./data}" \
  --output_dir ./logs \
  --do_train \
  --batch_size 2 \
  --val_batch_size 2 \
  --lr 1e-4 \
  --comm_rounds 30 \
  --local_epochs 1 \
  --optimizer_mode dat \
  --seed 1 \
  --adapter_reduction_factor 16 \
  --adapter_config pfeiffer \
  --splits train_small val test_small \
  --ordered_cl_tasks domain \
  "$@"
