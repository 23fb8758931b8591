"""Training losses, bit-parity with the reference.

  * VQA classification loss: ``BCEWithLogitsLoss(reduction='mean') * num_labels``
    (reference ``task_trainer.py:299``).
  * Cross-entropy for NLVR2/SNLI-VE/VCR (reference trainers).
  * Mutual-KD loss: temperature-3 KL with ``temp**2`` scaling and batchmean
    reduction (reference ``task_trainer.py:506-515``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits_vqa(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """``mean(BCEWithLogits(logits, target)) * num_labels``.

    Numerically stable elementwise BCE:
    ``max(x, 0) - x*t + log(1 + exp(-|x|))``.
    """
    x = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    per_elem = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per_elem) * logits.shape[-1]


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over the batch (integer labels)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def kd_kl_loss(output_logits: jnp.ndarray, target_logits: jnp.ndarray, temp: float = 3.0) -> jnp.ndarray:
    """KL(softmax(target/T) || softmax(output/T)) * T^2, batchmean.

    Matches ``kl_loss`` (``task_trainer.py:506-515``): softmax over the last
    axis (equal to the reference's dim-switch for both the 100-way ViLT case
    and the >3000-vocab ALBEF case), ``reduction='batchmean'`` divides the
    total by the first-axis size.  The caller is responsible for
    stop-gradient on ``target_logits`` (the reference detaches).
    """
    p_log = jax.nn.log_softmax(output_logits.astype(jnp.float32) / temp, axis=-1)
    q = jax.nn.softmax(target_logits.astype(jnp.float32) / temp, axis=-1)
    # F.kl_div(p_log, q, reduction='batchmean') == sum(q * (log q - p_log)) / B
    q_log = jnp.where(q > 0, jnp.log(jnp.maximum(q, 1e-38)), 0.0)
    kl = jnp.sum(q * (q_log - p_log)) / output_logits.shape[0]
    return kl * (temp**2)
