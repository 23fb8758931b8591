"""Seeding (reference ``src/utils/seed_utils.py:6-9`` + the per-process
offset at ``train_vqa_crossvqa.py:66``).

JAX randomness is already explicit (PRNGKeys threaded through state); this
seeds the HOST-side generators the pipelines use, with the reference's
per-process offset for multi-host determinism.
"""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int, per_process_offset: bool = True) -> int:
    """Seed python/numpy; returns the effective seed (seed + process index)."""
    import jax

    eff = seed + (jax.process_index() if per_process_offset else 0)
    random.seed(eff)
    np.random.seed(eff)
    return eff
