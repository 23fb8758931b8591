"""Trainer registry: task-trainer kind -> engine hooks.

The reference routes through per-task trainer classes
(``task_configs_fed.py`` carries ``task_trainer`` class refs:
``VQATrainerCross`` / ``VQATrainer`` / ``NLVR2Trainer`` / ``SNLIVETrainer``
/ ``VCRTrainer``).  Here each kind resolves to the functional hooks the
engine consumes: forward factory, eval factory, and (for ALBEF-distill) aux
seeding + the alpha-ramp batch transform.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional


@dataclasses.dataclass
class TrainerHooks:
    make_forward: Callable
    make_eval: Optional[Callable] = None
    metric: str = "vqa_score"
    aux_init: Optional[Callable] = None
    batch_transform: Optional[Callable] = None
    aux_forward: bool = False


def vilt_hooks(loss: str = "vqa", metric: str = "vqa_score") -> TrainerHooks:
    from feddat_tpu.train.forwards import make_vilt_forward

    return TrainerHooks(
        make_forward=lambda model, task_key: make_vilt_forward(model, task_key, loss),
        metric=metric,
    )


def albef_hooks(
    answer_banks: Dict[str, Any],
    distill: bool = False,
    rank_k: int = 64,
    pad_token_id: int = 0,
) -> TrainerHooks:
    """``answer_banks[task_key] = (answer_ids, answer_mask)``."""
    from feddat_tpu.train.evaluation import make_albef_eval_step
    from feddat_tpu.train.forwards import (
        add_alpha,
        make_albef_distill_forward,
        make_albef_forward,
    )

    def make_forward(model, task_key):
        if distill:
            return make_albef_distill_forward(model, pad_token_id)
        return make_albef_forward(model, pad_token_id)

    def make_eval(model, task_key):
        ids, mask = answer_banks[task_key]
        return make_albef_eval_step(model, ids, mask, k=rank_k, pad_token_id=pad_token_id)

    hooks = TrainerHooks(make_forward=make_forward, make_eval=make_eval)
    if distill:
        import jax

        hooks.aux_init = lambda params: jax.tree_util.tree_map(lambda x: x, params)
        hooks.batch_transform = add_alpha
        hooks.aux_forward = True
    return hooks


def albef_fused_task_loss(pad_token_id: int = 0):
    """Weighted shifted-CE over the dense answer bank (``albef_model.py:123-145``
    semantics) computed from pre-shifted cls logits — the task-loss hook for
    the fused/joint DAT cores."""
    import jax
    import jax.numpy as jnp

    def task_loss(shifted_logits, batch):
        B, A, La = batch["answer_ids"].shape
        ans_ids = batch["answer_ids"].reshape(B * A, La)
        targets = jnp.where(ans_ids == pad_token_id, -100, ans_ids)
        tgt = targets[:, 1:]
        valid = tgt != -100
        safe = jnp.where(valid, tgt, 0)
        # CE via LSE + target-logit gather (no fp32 [N, La-1, V] log-softmax
        # materialization; same math — see models/albef.py::shifted_lm_loss)
        lse = jax.scipy.special.logsumexp(
            shifted_logits.astype(jnp.float32), axis=-1
        )
        tgt_logit = jnp.take_along_axis(shifted_logits, safe[..., None], axis=-1)[
            ..., 0
        ].astype(jnp.float32)
        nll = jnp.where(valid, lse - tgt_logit, 0.0)
        seq_loss = jnp.sum(nll, axis=-1)
        weights = batch["answer_weights"].reshape(B * A)
        return jnp.sum(weights * seq_loss) / B

    return task_loss


def model_dropout_rate(model) -> float:
    """Max configured dropout rate across the model config (and its nested
    BERT config — ALBEF's reference default is hidden/attention dropout 0.1,
    ``model_configs.py:46-47``; ViLT's defaults are 0.0)."""
    cfg = getattr(model, "cfg", None) or getattr(model, "config", None)
    rates = []
    for holder in (cfg, getattr(cfg, "bert", None)):
        if holder is None:
            continue
        for field in ("hidden_dropout", "attention_dropout"):
            if hasattr(holder, field):
                rates.append(float(getattr(holder, field)))
    return max(rates, default=0.0)


def check_fused_dropout(model, carries: bool = False) -> float:
    """Dropout-semantics report for the fused/joint DAT cores.

    ``carries=True`` (the fused step since round 4): live dropout IS threaded
    through both encoder passes (fresh masks per step); the ONLY deviation
    from the reference's three independent stochastic forwards
    (``task_trainer.py:280-330``) is that DAT stages ① and ③ share the single
    ensemble pass's mask draw — distribution-level equivalence is tested
    (tests/test_dat_fused.py::test_albef_fused_dropout_distribution_matches_standard).
    Logged at INFO so runs record the deviation.

    ``carries=False`` (the joint step, which runs one deterministic
    mega-batch pass): live dropout is silently DROPPED — warn loudly.

    Returns the max configured dropout rate."""
    import logging

    live = model_dropout_rate(model)
    if live > 0.0:
        log = logging.getLogger("feddat_tpu")
        if carries:
            log.info(
                "fused DAT step carries live dropout (rate=%.2g) with fresh "
                "masks per step; deviation from the reference's three "
                "independent draws: DAT stages 1 and 3 share the ensemble "
                "pass's mask (distribution-level equivalence tested)",
                live,
            )
        else:
            log.warning(
                "joint DAT step drops dropout (model config has dropout=%.2g "
                "but the joint mega-batch pass is deterministic); training "
                "semantics differ from the standard DAT step — set dropout "
                "to 0 for exactness or use the standard/fused step",
                live,
            )
    return live


def make_albef_fused_dat_step(model, params, opt_cfg, max_steps, pad_token_id: int = 0, donate: bool = False, part=None, dropout_rng: str = "threefry"):
    """ALBEF fused DAT step: one ensemble encoder+decoder-backbone pass per
    batch (only the ``cls`` LM head changes between DAT stages ① and ③).
    Exact when dropout is off; with live dropout (ALBEF's default 0.1) the
    masks are threaded through both encoder passes — see
    :func:`check_fused_dropout` for the one documented deviation.

    ``part``: an existing :class:`Partitioner` to reuse (the sequential
    engine passes its per-client one); default builds the SPMD 'fed' one."""
    from feddat_tpu.configs.core import PEFTMode
    from feddat_tpu.peft.partition import label_params, split_by_roles
    from feddat_tpu.train.dat import Partitioner, make_dat_train_step_fused

    live = check_fused_dropout(model, carries=True)
    if part is None:
        part = Partitioner(params, "fed", PEFTMode.DAT)
    labels = label_params(params)
    _, frozen_rest = split_by_roles(params, labels, frozenset({"head"}))
    encode, head_fn, task_loss = albef_fused_parts(
        model, frozen_rest, pad_token_id, dropout=live > 0.0
    )
    return make_dat_train_step_fused(
        encode, head_fn, task_loss, part, opt_cfg, max_steps, donate=donate,
        dropout_rng=dropout_rng,
    ), part


def albef_fused_parts(model, frozen_rest, pad_token_id: int, dropout: bool = False):
    """The fused-ALBEF contract's ``(encode, head_fn, task_loss)`` trio —
    single source of truth shared by :func:`make_albef_fused_dat_step` and
    the SPMD engine's fused branch.  ``frozen_rest`` is the non-head param
    subtree merged back around the head for ``apply_cls``.

    ``dropout=True`` runs the encoder passes stochastically with the step's
    per-stage rng (the ``cls`` LM head has no dropout, so ``head_fn`` stays
    deterministic either way)."""
    from feddat_tpu.models.albef import AlbefModel
    from feddat_tpu.peft.partition import merge

    def encode(p, batch, mode, rng):
        if dropout:
            return model.apply(
                {"params": p}, batch, adapter_mode=mode, deterministic=False,
                rngs={"dropout": rng}, method=AlbefModel.encode_train,
            )
        return model.apply(
            {"params": p}, batch, adapter_mode=mode, deterministic=True,
            method=AlbefModel.encode_train,
        )

    def head_fn(head_subtree, hidden):
        return model.apply(
            {"params": merge(head_subtree, frozen_rest)}, hidden,
            method=AlbefModel.apply_cls,
        )

    return encode, head_fn, albef_fused_task_loss(pad_token_id)


def resolve_trainer(
    encoder_name: str,
    trainer_kind: str,
    answer_banks: Optional[Dict[str, Any]] = None,
    rank_k: int = 64,
    pad_token_id: int = 0,
) -> TrainerHooks:
    """trainer_kind per ``feddat_tpu.configs.tasks.TaskSpec.trainer``.
    Explicit keywords (no ``**kwargs``): a swallowed option like
    ``pad_token_id`` would silently mis-mask LM targets."""
    if encoder_name.startswith("albef"):
        if answer_banks is None:
            raise ValueError("albef trainers require answer_banks")
        return albef_hooks(
            answer_banks,
            distill=encoder_name == "albef_distill",
            rank_k=rank_k,
            pad_token_id=pad_token_id,
        )
    if trainer_kind in ("vqa_cross", "vqa"):
        return vilt_hooks(loss="vqa", metric="vqa_score")
    if trainer_kind in ("nlvr2", "snli_ve", "vcr"):
        return vilt_hooks(loss="ce", metric="accuracy")
    raise KeyError(f"unknown trainer kind {trainer_kind!r}")
