"""Evaluation loops.

Parity with the reference's ``eval`` / ``eval_one_loader``
(``task_trainer.py:113-246``): VQA soft score (ViLT classification) with
exact example counting, plus the DAT 3-mode protocol
[ensemble, adapter_0-only, adapter_1-only] (``task_trainer.py:229-244``).

TPU-first: batches are padded to a fixed size with a ``valid`` mask; the
masked sum replaces the reference's gather + last-batch truncation
(``task_trainer.py:129-156``) with identical results.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List

import jax
import jax.numpy as jnp

from feddat_tpu.data.vqa_scoring import batch_accuracy, compute_score_with_logits
from feddat_tpu.models.adapters import MODE_ENSEMBLE


def make_eval_step(model, task_key: str, metric: str = "vqa_score"):
    """Jitted ``(params, batch, adapter_mode static) -> masked per-batch score sum``."""

    def score_fn(logits, batch):
        if metric == "vqa_score":
            per = compute_score_with_logits(logits, batch["target_scores"])
        elif metric == "accuracy":
            per = batch_accuracy(logits, batch["labels"])
        else:
            raise ValueError(metric)
        valid = batch.get("valid")
        if valid is not None:
            per = per * valid.astype(per.dtype)
        return jnp.sum(per)

    from functools import partial

    @partial(jax.jit, static_argnames=("adapter_mode",))
    def step(params, batch, adapter_mode="none"):
        _, logits = model.apply(
            {"params": params}, task_key, batch, adapter_mode=adapter_mode, deterministic=True
        )
        return score_fn(logits, batch)

    return step


def make_albef_eval_step(model, answer_ids, answer_mask, k: int = 64, pad_token_id: int = 0):
    """ALBEF rank-answer eval step (``task_trainer.py:159-204``): top-1 of
    the reranked candidates hits any ground-truth label -> 1 point.

    ``answer_ids/mask``: the task's tokenized answer bank [num_answers, La].
    Returns jitted ``(params, batch, adapter_mode) -> masked hit-count``.
    """
    from functools import partial

    from feddat_tpu.models.albef import AlbefModel

    answer_ids = jnp.asarray(answer_ids)
    answer_mask = jnp.asarray(answer_mask)
    # a bank smaller than k caps the candidate count (the reference assumes
    # 100 answers >= k=64; small dev banks must not crash)
    k = min(k, int(answer_ids.shape[0]))

    @partial(jax.jit, static_argnames=("adapter_mode",))
    def step(params, batch, adapter_mode="none"):
        topk_ids, topk_probs = model.apply(
            {"params": params},
            batch,
            answer_ids,
            answer_mask,
            k,
            adapter_mode,
            pad_token_id,
            method=AlbefModel.rank_answer,
        )
        pred = topk_ids[:, 0]  # rerank output is sorted descending
        gt = batch["gt_labels"]  # [B, G], -1 padded
        hit = jnp.any((pred[:, None] == gt) & (gt >= 0), axis=1).astype(jnp.float32)
        valid = batch.get("valid")
        if valid is not None:
            hit = hit * valid
        return jnp.sum(hit)

    return step


def evaluate(
    params,
    eval_step,
    batches: Iterable[Dict[str, Any]],
    num_examples: int,
    adapter_mode: str = "none",
    debug_steps: int = 0,
) -> float:
    """Score sum over loader / num_examples * 100 (``task_trainer.py:157``).

    ``debug_steps`` reproduces the reference's ``--debug N`` eval truncation
    (``task_trainer.py:122-123,165-166``: batches 0..N run, the denominator
    stays the full dataset size).

    Per-batch scores stay ON DEVICE until the loop ends: a ``float()`` per
    batch would block the host on every step, serializing batch build/H2D
    transfer with device compute (the tunnel's H2D bandwidth makes that the
    dominant eval cost)."""
    partials = []
    for step_idx, batch in enumerate(batches):
        if debug_steps and step_idx > debug_steps:
            break
        partials.append(eval_step(params, batch, adapter_mode=adapter_mode))
    total = float(sum(float(p) for p in jax.device_get(partials))) if partials else 0.0
    return total / max(1, num_examples) * 100.0


def evaluate_dat(
    params,
    eval_step,
    batches_factory: Callable[[], Iterable[Dict[str, Any]]],
    num_examples: int,
    debug_steps: int = 0,
) -> List[float]:
    """DAT eval protocol (``task_trainer.py:229-244``):
    [gated ensemble, adapter_0 only, adapter_1 only].

    One pass over the data: each host-built batch is scored under all three
    adapter modes (identical results to three passes — eval batches are
    deterministic — at a third of the host decode/tokenize/H2D cost)."""
    modes = (MODE_ENSEMBLE, "adapter_0", "adapter_1")
    partials: Dict[str, list] = {m: [] for m in modes}
    for step_idx, batch in enumerate(batches_factory()):
        if debug_steps and step_idx > debug_steps:
            break
        for m in modes:
            partials[m].append(eval_step(params, batch, adapter_mode=m))
    return [
        (
            float(sum(float(p) for p in jax.device_get(partials[m])))
            if partials[m] else 0.0
        )
        / max(1, num_examples)
        * 100.0
        for m in modes
    ]
