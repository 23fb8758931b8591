"""Checkpoint / resume.

The reference's checkpointing is vestigial — directories are created but no
live ``torch.save`` exists in the federated path (SURVEY.md §5.4).  This
module provides what it lacks: orbax persistence of the full federated
experiment state — server params, per-client personal partitions, the round
counter, and the host RNG — with real resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_federated_state(
    directory: str,
    round_idx: int,
    server_params: Dict[str, Any],
    personal: Dict[str, Dict[str, Any]],
    rng,
) -> str:
    """Write a round checkpoint; returns the checkpoint path."""
    path = os.path.join(os.path.abspath(directory), f"round_{round_idx:05d}")
    state = {
        "round": np.asarray(round_idx),
        "server_params": server_params,
        "personal": personal,
        "rng": np.asarray(rng),
    }
    _checkpointer().save(path, state, force=True)
    return path


def write_meta(directory: str, meta: Dict[str, Any]) -> str:
    """Persist the run's model recipe next to the round checkpoints
    (``meta.json``): everything ``serving.*.from_checkpoint`` needs to
    rebuild the model and pick the right head/adapter mode without the
    original launch command."""
    import json

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(os.path.abspath(directory), "meta.json")
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, path)
    return path


def load_meta(directory: str) -> Optional[Dict[str, Any]]:
    import json

    path = os.path.join(os.path.abspath(directory), "meta.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def latest_round(directory: str) -> Optional[int]:
    """Largest N with a ``round_NNNNN`` entry.  Strict name match: stray
    entries like ``round_00012_old`` (manual backups, tool artifacts) must
    not make resume target a checkpoint path that does not exist."""
    import re

    if not os.path.isdir(directory):
        return None
    rounds = [
        int(m.group(1))
        for d in os.listdir(directory)
        if (m := re.fullmatch(r"round_(\d{5})", d))
    ]
    return max(rounds) if rounds else None


def restore_federated_state(directory: str, round_idx: Optional[int] = None):
    """-> (round, server_params, personal, rng) or None if no checkpoint."""
    if round_idx is None:
        round_idx = latest_round(directory)
        if round_idx is None:
            return None
    path = os.path.join(os.path.abspath(directory), f"round_{round_idx:05d}")
    state = _checkpointer().restore(path)
    return (
        int(state["round"]),
        state["server_params"],
        state["personal"],
        jax.numpy.asarray(state["rng"], dtype=jax.numpy.uint32),
    )
