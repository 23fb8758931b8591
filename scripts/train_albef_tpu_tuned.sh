#!/usr/bin/env bash
# The TPU-tuned ALBEF launch (PERF.md's measured-optimal configuration):
# batch 48 per pass, bf16 compute, the whole-LAYER Pallas kernel on the
# ViT tower (--attn_impl layer routes to vision_attn_impl for ALBEF; its
# vjp saves its own residuals so the ViT scan skips remat), block_save_nox
# remat on the ViT epilogue + the 'names' selective policy on the post-LN
# BERT towers (saves the fusion layers' S=577 image K/V projections),
# hardware-RNG dropout masks (--dropout_rng rbg), fused DAT step (live
# dropout), SPMD engine.  131.5 samples/s per v5e chip vs 82 round-1,
# 99 round-3 block, 116 round-4 layer (PERF.md round-5 lever table).
set -euo pipefail
python -m feddat_tpu.cli \
  --encoder_name albef_no_distill \
  --pretrained_model_name "${ALBEF_CHECKPOINT:-}" \
  --vocab_file "${BERT_VOCAB:-}" \
  --climb_data_dir "${DATA_DIR:-./data}" \
  --output_dir ./logs \
  --do_train \
  --batch_size 48 \
  --val_batch_size 48 \
  --lr 1e-4 \
  --optimizer_mode dat \
  --seed 2 \
  --adapter_reduction_factor 16 \
  --adapter_config pfeiffer \
  --splits train_small val test \
  --ordered_cl_tasks domain \
  --engine spmd \
  --dtype bfloat16 \
  --remat \
  --remat_policy block_save_nox \
  --text_remat_policy names \
  --dropout_rng rbg \
  --attn_impl layer \
  --cache_images \
  --device_normalize \
  --use_fused_dat \
  "$@"
