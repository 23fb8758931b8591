#!/usr/bin/env bash
# The TPU-tuned ViLT launch (PERF.md's measured-optimal configuration):
# batch 64 per pass, bf16 compute, the whole-LAYER Pallas kernel
# (--attn_impl layer, ops/layer_block.py: adapter grads + the frozen
# attention/LN/FFN backward in ONE fused vjp per layer — the stack needs
# no remat), fused DAT step, all clients as one SPMD program over the
# (client, data) mesh.  Same training semantics as scripts/train_vilt.sh
# (fused step exact with encoder dropout off, ViLT's default).
set -euo pipefail
python -m feddat_tpu.cli \
  --encoder_name vilt \
  --pretrained_model_name "${VILT_CHECKPOINT:-}" \
  --vocab_file "${BERT_VOCAB:-}" \
  --climb_data_dir "${DATA_DIR:-./data}" \
  --output_dir ./logs \
  --do_train \
  --batch_size 64 \
  --val_batch_size 64 \
  --lr 1e-4 \
  --comm_rounds 30 \
  --local_epochs 1 \
  --optimizer_mode dat \
  --seed 1 \
  --adapter_reduction_factor 16 \
  --splits train_small val test_small \
  --ordered_cl_tasks domain \
  --engine spmd \
  --dtype bfloat16 \
  --attn_impl layer \
  --cache_images \
  --device_normalize \
  --use_fused_dat \
  "$@"
