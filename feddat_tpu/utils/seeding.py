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


def dropout_key(rng, impl: str = "threefry"):
    """Re-key a (threefry) PRNG key for dropout-mask generation.

    ``impl="rbg"`` wraps the key's data into a ``jax.random`` RBG key: splits
    and fold_ins stay cheap threefry ops on the key itself, but BULK bit
    generation (the [B,H,Sq,Sk] attention-prob and [B,S,D] hidden dropout
    masks) lowers to the TPU's native hardware RNG (XLA RngBitGenerator)
    instead of per-element threefry on the VPU — measured +7% on the ALBEF
    fused DAT step (dropout 0.1 on 24 BERT layer-sites, PERF.md round 5).
    Mask streams differ from threefry's, which is immaterial for dropout
    (any IID Bernoulli source is valid; torch's masks differ from BOTH).
    The step's state rng stays a plain threefry key either way —
    checkpointing, gating, and the key chain are unchanged; only the
    per-step derived dropout keys are re-wrapped inside the jitted step.
    """
    if impl in (None, "threefry"):
        return rng
    import jax
    import jax.numpy as jnp

    data = jax.random.key_data(rng)  # threefry: uint32[2]
    width = jax.random.key_data(jax.random.key(0, impl=impl)).shape[-1]
    reps = -(-width // data.shape[-1])
    tiled = jnp.concatenate([data] * reps, axis=-1)[..., :width]
    return jax.random.wrap_key_data(tiled, impl=impl)
