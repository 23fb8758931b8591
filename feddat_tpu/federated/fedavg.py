"""FedAvg aggregation as pytree arithmetic.

Reference (``src/train/main.py:50-65``): sample-count-weighted average of the
``comm_state_dict_names`` subset across client models (weights hardcoded
uniform at ``main.py:455``), skipping ``clf`` keys.  Here the communicated
subset is already a structurally-separate subtree, so aggregation is a single
``tree_map``; the SPMD engine replaces it with a ``psum`` over the clients
mesh axis (see ``feddat_tpu/federated/spmd.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def fedavg(
    comm_trees: Sequence[Dict[str, Any]],
    weights: Optional[Sequence[float]] = None,
) -> Dict[str, Any]:
    """Weighted average of per-client communicated subtrees."""
    n = len(comm_trees)
    if weights is None:
        weights = [1.0] * n
    if len(weights) != n:
        # zip() would silently drop clients / shrink the average; the SPMD
        # engine rejects the same config loudly — match it
        raise ValueError(
            f"client_weights has {len(weights)} entries for {n} clients"
        )
    total = float(np.sum(weights))
    norm = [float(w) / total for w in weights]

    def avg(*leaves):
        acc = norm[0] * leaves[0].astype(jnp.float32)
        for w, leaf in zip(norm[1:], leaves[1:]):
            acc = acc + w * leaf.astype(jnp.float32)
        return acc.astype(leaves[0].dtype)

    return jax.tree_util.tree_map(avg, *comm_trees)
