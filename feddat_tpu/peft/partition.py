"""Structural parameter partitioning.

This is the reference's ``requires_grad`` masks + ``comm_state_dict_names`` +
``personal_params`` name-matching (``src/train/main.py:125-250, 440-450``)
re-done as pure pytree operations: every param path gets a *role* label, and
the PEFT mode maps roles to {trainable, communicated, personal} sets.

Roles:
  * ``backbone``  — pretrained encoder weights
  * ``shared``    — the federated-communicated subset (``adapter_1`` under
                    DAT; ``adapter`` under plain adapter mode; lora/bias/...
                    under the corresponding baseline modes)
  * ``local``     — client-personal adapter (``adapter_0``)
  * ``teacher``   — frozen teacher (``adapter_2``)
  * ``head``      — task heads (always trainable, always personal;
                    reference ``main.py:127-130, 248-250``)
  * ``norm`` / ``bias`` / ``lora`` / ``prompt`` — baseline-PEFT partitions,
    labeled structurally so each mode can select them.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, FrozenSet, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from feddat_tpu.configs.core import PEFTMode

ROLE_BACKBONE = "backbone"
ROLE_SHARED = "shared"
ROLE_LOCAL = "local"
ROLE_TEACHER = "teacher"
ROLE_HEAD = "head"
ROLE_NORM = "norm"
# LayerNorm biases: trainable under BOTH ``norm`` mode (module-name match)
# and ``bias`` mode (param-name match) in the reference (``main.py:176-196``).
ROLE_NORM_BIAS = "norm_bias"
ROLE_BIAS = "bias"
ROLE_LORA = "lora"
ROLE_PROMPT = "prompt"

Params = Dict[str, Any]


def _role_of_path(path: Tuple[str, ...]) -> str:
    """Classify one flattened param path.

    Order matters: adapter/lora/prompt/head tags beat the generic norm/bias
    fallbacks (the reference's name matching has the same precedence because
    its mode branches are exclusive).
    """
    joined = "/".join(path)
    # heads: ViLT per-task modules (``task_<key>/...``) and ALBEF's LM
    # prediction head (a ``cls`` path component, reference ``main.py:127-130``)
    # — component-exact like ``Partitioner.head_paths`` so the two head
    # matchers can never disagree
    if "task_" in joined or "cls" in path:
        return ROLE_HEAD
    if "adapter_1" in joined:
        return ROLE_SHARED
    if "adapter_0" in joined:
        return ROLE_LOCAL
    if "adapter_2" in joined:
        return ROLE_TEACHER
    if "adapter" in joined:
        # single-adapter mode: the one shared adapter
        return ROLE_SHARED
    if "lora_" in joined:
        return ROLE_LORA
    if "prompt" in joined:
        return ROLE_PROMPT
    if "norm" in joined:
        return ROLE_NORM_BIAS if path[-1] == "bias" else ROLE_NORM
    if path[-1] == "bias":
        return ROLE_BIAS
    return ROLE_BACKBONE


def label_params(params: Params) -> Params:
    """Pytree of role labels, same structure as ``params``."""
    flat = traverse_util.flatten_dict(params)
    labels = {path: _role_of_path(tuple(str(p) for p in path)) for path in flat}
    return traverse_util.unflatten_dict(labels)


def trainable_roles(mode: PEFTMode, num_layers_frozen: int = 0) -> FrozenSet[str]:
    """Which roles receive gradients (reference ``main.py:132-250``).

    Heads are always trainable in every mode (``main.py:248-250``).
    """
    base = {ROLE_HEAD}
    if mode == PEFTMode.FULL:
        return frozenset(
            base
            | {
                ROLE_BACKBONE,
                ROLE_SHARED,
                ROLE_LOCAL,
                ROLE_NORM,
                ROLE_NORM_BIAS,
                ROLE_BIAS,
                ROLE_LORA,
                ROLE_PROMPT,
            }
        )
    if mode == PEFTMode.ADAPTER:
        return frozenset(base | {ROLE_SHARED})
    if mode == PEFTMode.DAT:
        # adapter_2 (teacher) is frozen (``adapter.py:55-58``); 0/1 trainable.
        return frozenset(base | {ROLE_SHARED, ROLE_LOCAL})
    if mode == PEFTMode.NORM:
        return frozenset(base | {ROLE_NORM, ROLE_NORM_BIAS})
    if mode == PEFTMode.BIAS:
        return frozenset(base | {ROLE_BIAS, ROLE_NORM_BIAS})
    if mode == PEFTMode.LORA:
        return frozenset(base | {ROLE_LORA})
    if mode == PEFTMode.PROMPT:
        return frozenset(base | {ROLE_PROMPT})
    if mode in (PEFTMode.NONE, PEFTMode.FREEZE_ENCODER):
        return frozenset(base)
    if mode == PEFTMode.FREEZE_BOTTOM_K:
        # Handled by an additional per-layer mask; roles alone say "all".
        return frozenset(
            base | {ROLE_BACKBONE, ROLE_NORM, ROLE_NORM_BIAS, ROLE_BIAS}
        )
    raise ValueError(f"unknown mode {mode}")


def comm_roles(mode: PEFTMode) -> FrozenSet[str]:
    """Roles harvested into the FedAvg-communicated subset
    (``comm_state_dict_names`` routing, ``main.py:132-245``)."""
    if mode == PEFTMode.FULL:
        return frozenset(
            {ROLE_BACKBONE, ROLE_SHARED, ROLE_LOCAL, ROLE_TEACHER, ROLE_NORM, ROLE_NORM_BIAS, ROLE_BIAS}
        )
    if mode in (PEFTMode.ADAPTER, PEFTMode.DAT):
        return frozenset({ROLE_SHARED})
    if mode == PEFTMode.NORM:
        return frozenset({ROLE_NORM, ROLE_NORM_BIAS})
    if mode == PEFTMode.BIAS:
        return frozenset({ROLE_BIAS, ROLE_NORM_BIAS})
    if mode == PEFTMode.LORA:
        return frozenset({ROLE_LORA})
    if mode == PEFTMode.PROMPT:
        return frozenset({ROLE_PROMPT})
    return frozenset()


def personal_roles(mode: PEFTMode) -> FrozenSet[str]:
    """Client-personal partitions (reference ``main.py:127-130, 154``):
    heads always; plus local adapter + teacher under DAT."""
    if mode == PEFTMode.DAT:
        return frozenset({ROLE_HEAD, ROLE_LOCAL, ROLE_TEACHER})
    return frozenset({ROLE_HEAD})


def split_by_roles(params: Params, labels: Params, roles: FrozenSet[str]) -> Tuple[Params, Params]:
    """Split params into (selected, rest) by role membership.

    Both outputs keep full-tree *structure* via flattened-dict filtering, so
    ``merge`` can losslessly reassemble.
    """
    flat_p = traverse_util.flatten_dict(params)
    flat_l = traverse_util.flatten_dict(labels)
    inside = {k: v for k, v in flat_p.items() if flat_l[k] in roles}
    outside = {k: v for k, v in flat_p.items() if flat_l[k] not in roles}
    return (
        traverse_util.unflatten_dict(inside),
        traverse_util.unflatten_dict(outside),
    )


def merge(*trees: Params) -> Params:
    """Reassemble trees produced by ``split_by_roles`` (disjoint paths)."""
    flat: Dict[Tuple[str, ...], Any] = {}
    for t in trees:
        flat.update(traverse_util.flatten_dict(t))
    return traverse_util.unflatten_dict(flat)


def map_role_leaves(params: Params, labels: Params, roles: FrozenSet[str], fn: Callable) -> Params:
    """Apply ``fn`` to leaves whose role is in ``roles``; identity elsewhere."""
    flat_p = traverse_util.flatten_dict(params)
    flat_l = traverse_util.flatten_dict(labels)
    out = {k: (fn(v) if flat_l[k] in roles else v) for k, v in flat_p.items()}
    return traverse_util.unflatten_dict(out)


def teacher_refresh(params: Params) -> Params:
    """Copy ``adapter_1`` weights into ``adapter_2`` (the DAT teacher refresh
    at the start of each client's local training, reference
    ``task_trainer.py:36-45``)."""
    flat = traverse_util.flatten_dict(params)
    out = dict(flat)
    for path, value in flat.items():
        strs = tuple(str(p) for p in path)
        if any("adapter_1" in p for p in strs):
            tgt = tuple(p.replace("adapter_1", "adapter_2") for p in strs)
            if tgt in flat:
                out[tgt] = value
    return traverse_util.unflatten_dict(out)


def count_params(params: Params) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(params))


def param_budget(params: Params, mode: PEFTMode) -> Dict[str, Any]:
    """Startup trainable-parameter report (reference prints counts/% at
    ``src/train/main.py:371-374``): total / trainable / communicated /
    personal counts and trainable %."""
    labels = label_params(params)
    total = count_params(params)
    trainable, _ = split_by_roles(params, labels, trainable_roles(mode))
    communicated, _ = split_by_roles(params, labels, comm_roles(mode))
    personal, _ = split_by_roles(params, labels, personal_roles(mode))
    n_train = count_params(trainable)
    return {
        "total": total,
        "trainable": n_train,
        "communicated": count_params(communicated),
        "personal": count_params(personal),
        "trainable_pct": 100.0 * n_train / max(total, 1),
    }
