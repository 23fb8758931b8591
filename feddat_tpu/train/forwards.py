"""Model-specific forward factories for the train steps.

The reference dispatches through ``batch2inputs_converter`` + encoder-name
string checks (``task_trainer.py:248-264``, ``albef.py:275-287``); here each
model family provides a factory returning the uniform
``forward(params, batch, adapter_mode, dropout_rng) -> (task_loss, logits)``
the step builders consume.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from feddat_tpu.train.losses import bce_with_logits_vqa, cross_entropy


def make_vilt_forward(model, task_key: str, loss: str = "vqa"):
    """ViLT classification forward: BCE*C for VQA (``task_trainer.py:299``)
    or CE for NLVR2/SNLI-VE/VCR (reference trainers)."""

    def forward(p, batch, mode, dropout_rng):
        _, logits = model.apply(
            {"params": p},
            task_key,
            batch,
            adapter_mode=mode,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        if loss == "vqa":
            task_loss = bce_with_logits_vqa(logits, batch["target_scores"])
        else:
            task_loss = cross_entropy(logits, batch["labels"])
        return task_loss, logits

    return forward


def make_albef_forward(model, pad_token_id: int = 0):
    """ALBEF train forward -> (weighted LM loss, shifted logits)
    (``albef_model.py:69-145``, no-distill branch — the variant the
    reference's federated launch uses, ``train_albef.sh``).

    The KD logits for DAT's mutual distillation are the shifted decoder
    logits, exactly what the reference feeds ``kl_loss``
    (``task_trainer.py:300,320``).
    """

    def forward(p, batch, mode, dropout_rng):
        loss, logits = model.apply(
            {"params": p},
            batch,
            adapter_mode=mode,
            deterministic=False,
            alpha=batch.get("alpha", 0.0),
            pad_token_id=pad_token_id,
            rngs={"dropout": dropout_rng},
        )
        return loss, logits

    return forward


def make_albef_distill_forward(model, pad_token_id: int = 0):
    """Momentum-distillation forward for the PLAIN (single-update) step:
    EMA-update the twin, compute its soft logits without grad, mix
    ``(1-alpha)*CE + alpha*soft`` (``albef_model.py:100-132``).

    Returns ``forward(params, batch, mode, rng, aux) -> (loss, logits, aux)``
    where ``aux`` is the momentum param tree.  (The reference's DAT+distill
    combination is dead code — the twins' adapters are never activated — so
    distillation is supported on the plain path only.)
    """
    from feddat_tpu.models.albef import momentum_update

    def forward(p, batch, mode, dropout_rng, aux):
        r1, r2 = jax.random.split(dropout_rng)
        aux = momentum_update(jax.lax.stop_gradient(p), aux, model.cfg.momentum)
        soft = model.apply(
            {"params": aux},
            batch,
            adapter_mode=mode,
            deterministic=False,
            method=type(model).forward_train_logits,
            rngs={"dropout": r1},
        )
        soft = jax.lax.stop_gradient(soft)
        loss, logits = model.apply(
            {"params": p},
            batch,
            adapter_mode=mode,
            deterministic=False,
            soft_logits=soft,
            alpha=batch.get("alpha", 0.0),
            pad_token_id=pad_token_id,
            rngs={"dropout": r2},
        )
        return loss, logits, aux

    return forward


def add_alpha(batch: Dict[str, Any], epoch: int, step: int, steps_per_epoch: int) -> Dict[str, Any]:
    """Distill-alpha ramp (``train_vqa_crossvqa.py:265-271``): 0.4 ramped
    linearly over epoch 0, constant 0.4 afterwards."""
    if epoch > 0:
        alpha = 0.4
    else:
        alpha = 0.4 * min(1.0, step / max(1, steps_per_epoch))
    out = dict(batch)
    out["alpha"] = alpha
    return out
