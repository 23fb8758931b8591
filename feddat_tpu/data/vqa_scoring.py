"""VQA soft-score utilities (parity with ``src/utils/vqa_utils.py`` and
``train_vqa_crossvqa.py:241-257``)."""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np


def get_score(occurences: int) -> float:
    """Occurrence count -> VQA soft score (``vqa_utils.py:21-31``)."""
    if occurences == 0:
        return 0.0
    if occurences == 1:
        return 0.3
    if occurences == 2:
        return 0.6
    if occurences == 3:
        return 0.9
    return 1.0


def target_tensor(num_labels: int, labels: Sequence[int], scores: Sequence[float]) -> np.ndarray:
    """Scatter soft scores into a dense [num_labels] target
    (``vqa_utils.py:62-67``)."""
    target = np.zeros((num_labels,), dtype=np.float32)
    if len(labels):
        target[np.asarray(labels, dtype=np.int64)] = np.asarray(scores, dtype=np.float32)
    return target


def compute_score_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample VQA score of the argmax answer
    (``train_vqa_crossvqa.py:241-257``): ``sum(one_hot(argmax) * target, -1)``."""
    pred = jnp.argmax(logits, axis=-1)
    picked = jnp.take_along_axis(target, pred[:, None], axis=-1)[:, 0]
    return picked


def batch_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample 0/1 accuracy for CE tasks (``task_trainer.py:139``)."""
    return (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
