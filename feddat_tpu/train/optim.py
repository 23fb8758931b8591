"""AdamW + polynomial warmup-decay, exact parity with the reference.

Reference optimizer (``task_trainer.py:477-504``): torch AdamW with
betas (0.9, 0.98), per-task eps/wd, no-decay group for biases; scheduler
(``task_trainer.py:53-59``): ``get_polynomial_decay_schedule_with_warmup``
with power=1, lr_end=0, warmup = 0.1 * max_steps.

Torch-parity notes:
  * torch AdamW: ``p -= lr * (m_hat / (sqrt(v_hat) + eps) + wd * p)`` —
    reproduced by ``scale_by_adam -> add_decayed_weights -> scale(-1)`` with
    the learning rate applied *externally* per update.  The external lr lets
    the DAT step share ONE schedule clock across its two masked updates per
    batch (the reference ticks the scheduler after each of the two
    ``optimizer.step()`` calls, ``task_trainer.py:304-308, 324-328``).
  * torch LambdaLR applies ``factor(k)`` to the k-th update (0-indexed,
    factor(0)=0 when warmup>0) — same convention as ``schedule(count)`` here.
  * the reference's no-decay name match is ``['bias', 'LayerNorm.weight']``;
    structurally that is: every bias, plus the LN scales of BERT-lineage
    modules literally named ``LayerNorm`` in torch (see ``_decay_mask``).
    The DAT/adapter path is insensitive (adapters are Linears; the head LN's
    torch name ``clf_norm0.weight`` does not match and IS decayed), but the
    ``norm``/``full`` PEFT modes train encoder LNs where the split matters.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from feddat_tpu.configs.core import OptimizerConfig


def polynomial_schedule(cfg: OptimizerConfig, max_steps: int) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """``get_polynomial_decay_schedule_with_warmup`` (power=1 -> linear)."""
    warmup = int(max_steps * cfg.warmup_ratio)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(1.0, warmup)
        remaining = jnp.maximum(0.0, (max_steps - count) / jnp.maximum(1.0, max_steps - warmup))
        decay = cfg.lr_end + (cfg.lr - cfg.lr_end) * remaining**cfg.power
        lr = jnp.where(count < warmup, cfg.lr * warm, decay)
        # After max_steps the reference clamps at lr_end.
        return jnp.where(count >= max_steps, cfg.lr_end, lr)

    return schedule


def polynomial_schedule_dyn(cfg: OptimizerConfig) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """:func:`polynomial_schedule` with ``max_steps`` as a TRACED value —
    the SPMD full-epochs mode runs every client in one jitted program but
    each client keeps its own schedule horizon (sequential parity:
    ``engine.py`` builds per-client ``steps_per_epoch * num_epochs``)."""

    def schedule(count, max_steps):
        count = jnp.asarray(count, jnp.float32)
        max_steps = jnp.asarray(max_steps, jnp.float32)
        warmup = jnp.floor(max_steps * cfg.warmup_ratio)
        warm = count / jnp.maximum(1.0, warmup)
        remaining = jnp.maximum(0.0, (max_steps - count) / jnp.maximum(1.0, max_steps - warmup))
        decay = cfg.lr_end + (cfg.lr - cfg.lr_end) * remaining**cfg.power
        lr = jnp.where(count < warmup, cfg.lr * warm, decay)
        return jnp.where(count >= max_steps, cfg.lr_end, lr)

    return schedule


# Modules whose torch parameter is literally named ``LayerNorm.weight`` —
# the only LN scales in the reference's no-decay group.  HF-ViLT's
# layernorm_before/layernorm_after/layernorm, timm-ViT's norm1/norm2/norm
# and the clf head LN carry lowercase/renamed torch names and ARE decayed
# by the reference's substring match.
_TORCH_LAYERNORM_WEIGHT_PARENTS = (
    "norm",  # text/xbert embeddings LayerNorm
    "attention_norm",
    "crossattention_norm",
    "output_norm",
    "transform_norm",
)


def _decay_mask(params) -> Any:
    """Reference no-decay routing (``task_trainer.py:496-503``): torch names
    containing ``'bias'`` or ``'LayerNorm.weight'`` skip weight decay."""
    flat = traverse_util.flatten_dict(params)

    def decays(k) -> bool:
        if str(k[-1]) == "bias":
            return False
        if (
            str(k[-1]) == "scale"
            and len(k) > 1
            and str(k[-2]) in _TORCH_LAYERNORM_WEIGHT_PARENTS
        ):
            return False
        return True

    return traverse_util.unflatten_dict({k: decays(k) for k in flat})


def adamw_direction(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """The *direction* part of torch-AdamW (lr applied externally)."""
    return optax.chain(
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.adam_eps, eps_root=0.0),
        optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask),
        optax.scale(-1.0),
    )


def apply_direction(
    tx: optax.GradientTransformation,
    grads,
    opt_state,
    params,
    lr: jnp.ndarray,
):
    """One torch-AdamW step at learning rate ``lr``; returns (params, state)."""
    updates, new_state = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
    return optax.apply_updates(params, updates), new_state
