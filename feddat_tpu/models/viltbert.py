"""ViLT-BERT: ViLT whose text stream is embedded by a frozen BERT.

Behavioral port of ``src/modeling/viltbert.py:31-585``: a standard 12-layer
BERT runs over the text with gradients stopped (``get_bert_outputs`` under
``no_grad``, ``viltbert.py:115-120``); its last hidden states feed the ViLT
encoder as ``inputs_embeds`` (``viltbert.py:122-138``).  Adapters/LoRA attach
to the ViLT half only (the reference comments out the BERT-half hooks).

The frozen BERT is expressed structurally: its params are labeled
``backbone`` (never trainable in PEFT modes) AND its activations pass
through ``stop_gradient``, so even FULL mode matches the reference's frozen
behavior.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from feddat_tpu.configs.core import AlbefBertConfig, ViltModelConfig
from feddat_tpu.models.vilt import ViltContinualLearner
from feddat_tpu.models.xbert import XBertModel


def _text_bert_config(cfg: ViltModelConfig) -> AlbefBertConfig:
    """Pure-text BERT (fusion_layer == num_layers -> no cross-attention).

    Dropout is bert-base-uncased's 0.1 — NOT ViLT's 0.0: the reference
    builds this half with ``BertModel.from_pretrained('bert-base-uncased')``
    (``viltbert.py:509``) and ``torch.no_grad()`` does not disable dropout,
    so the frozen BERT emits dropout-noised embeddings during training."""
    return AlbefBertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=max(cfg.max_text_len, 512),
        hidden_dropout=0.1,
        attention_dropout=0.1,
        layer_norm_eps=cfg.layer_norm_eps,
        fusion_layer=cfg.num_layers,
    )


class ViltBertContinualLearner(ViltContinualLearner):
    """Same head/dispatch surface as ``ViltContinualLearner``; only the text
    embedding source differs."""

    def setup(self):
        ViltContinualLearner.setup(self)  # encoder + task heads (one source of truth)
        self.text_bert = XBertModel(
            _text_bert_config(self.config), dtype=self.dtype, name="text_bert"
        )

    def _bert_embeds(self, input_ids, attention_mask, deterministic):
        """Frozen BERT text states (``viltbert.py:115-120``)."""
        out = self.text_bert(
            input_ids,
            attention_mask,
            mode="multi_modal",
            deterministic=deterministic,
        )
        return jax.lax.stop_gradient(out)

    def encode_single_image(self, task_key, batch, adapter_mode="none", deterministic=True):
        """Encoder-only forward (fused/joint DAT steps) — must route text
        through the frozen BERT like the full forward."""
        embeds = self._bert_embeds(batch["input_ids"], batch["attention_mask"], deterministic)
        _, pooled = self.encoder(
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            token_type_ids=batch.get("token_type_ids"),
            pixel_values=batch["pixel_values"],
            pixel_mask=batch.get("pixel_mask"),
            adapter_mode=adapter_mode,
            deterministic=deterministic,
            inputs_embeds=embeds,
            adapter_weights=batch.get("adapter_weights"),
        )
        return pooled

    def forward_single_image(self, task_key, batch, adapter_mode="none", deterministic=True):
        embeds = self._bert_embeds(batch["input_ids"], batch["attention_mask"], deterministic)
        _, pooled = self.encoder(
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            token_type_ids=batch.get("token_type_ids"),
            pixel_values=batch["pixel_values"],
            pixel_mask=batch.get("pixel_mask"),
            adapter_mode=adapter_mode,
            deterministic=deterministic,
            inputs_embeds=embeds,
        )
        logits = self._heads[task_key](pooled)
        return pooled, logits

    def forward_multi_images(self, task_key, batch, adapter_mode="none", deterministic=True):
        spec = self.task_heads[task_key]
        embeds = self._bert_embeds(batch["input_ids"], batch["attention_mask"], deterministic)
        pooled_all = []
        for i in range(spec.num_images):
            _, pooled = self.encoder(
                input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                token_type_ids=batch.get("token_type_ids"),
                pixel_values=batch["pixel_values"][:, i],
                pixel_mask=None if batch.get("pixel_mask") is None else batch["pixel_mask"][:, i],
                image_token_type_idx=i + 1,
                adapter_mode=adapter_mode,
                deterministic=deterministic,
                inputs_embeds=embeds,
            )
            pooled_all.append(pooled)
        pooled = jnp.concatenate(pooled_all, axis=-1)
        return pooled, self._heads[task_key](pooled)

    def forward_multi_choice(self, task_key, batch, adapter_mode="none", deterministic=True):
        spec = self.task_heads[task_key]
        pooled_all = []
        for i in range(spec.num_choices):
            ids = batch["input_ids"][:, i]
            mask = batch["attention_mask"][:, i]
            embeds = self._bert_embeds(ids, mask, deterministic)
            _, pooled = self.encoder(
                input_ids=ids,
                attention_mask=mask,
                token_type_ids=None if batch.get("token_type_ids") is None else batch["token_type_ids"][:, i],
                pixel_values=batch["pixel_values"],
                pixel_mask=batch.get("pixel_mask"),
                adapter_mode=adapter_mode,
                deterministic=deterministic,
                inputs_embeds=embeds,
            )
            pooled_all.append(pooled)
        pooled = jnp.stack(pooled_all, axis=1)
        logits = self._heads[task_key](pooled, deterministic=deterministic)
        return pooled, logits.squeeze(-1)

    def init_all(self, batch: Dict[str, Any], adapter_mode: str = "init_all"):
        def squash(x, rank):
            if x is None:
                return None
            return x[:, 0] if x.ndim > rank else x

        ids = squash(batch["input_ids"], 2)
        mask = squash(batch["attention_mask"], 2)
        embeds = self._bert_embeds(ids, mask, True)
        _, pooled = self.encoder(
            input_ids=ids,
            attention_mask=mask,
            token_type_ids=squash(batch.get("token_type_ids"), 2),
            pixel_values=squash(batch["pixel_values"], 4),
            pixel_mask=squash(batch.get("pixel_mask"), 3),
            adapter_mode=adapter_mode,
            deterministic=True,
            inputs_embeds=embeds,
        )
        out = 0.0
        for key, spec in self.task_heads.items():
            if spec.model_type == "multi-choice":
                logits = self._heads[key](pooled[:, None, :])
            else:
                tiled = jnp.concatenate([pooled] * spec.num_images, axis=-1)
                logits = self._heads[key](tiled)
            out = out + jnp.sum(logits)
        return out
