"""Tensor-parallel (``model`` axis) sharding for larger backbones.

SURVEY §2.7 names the TPU-native parallelism decomposition as a
``(clients, data)`` mesh "+ optional ``model`` axis for larger backbones".
The reference has no TP (its models fit one GPU) and ViLT-B/ALBEF fit one
TPU chip — but the framework is built to scale, so the model axis is a
first-class option here: Megatron-style column/row sharding of every
transformer stack, expressed purely through ``jax.sharding`` annotations
(GSPMD inserts the all-reduces; no manual collectives — the scaling-book
recipe).

Layout per layer (applies uniformly to ViLT layers, ALBEF ViT blocks, and
xBERT text/fusion/decoder stacks, whose scanned params all carry a leading
[L] axis):

  * q/k/v projections: COLUMN-parallel (output dim = heads sharded over
    ``model``) — each shard computes its heads' attention locally;
  * attention out-projection: ROW-parallel (input dim sharded) — GSPMD
    inserts one all-reduce per layer on its output;
  * FFN intermediate: column-parallel; FFN output: row-parallel (second
    all-reduce per layer);
  * everything else — embeddings, LayerNorms, adapters, heads, and ALL
    biases — replicated.  Biases stay replicated deliberately even where
    Megatron would column-shard them: in ``PEFTMode.BIAS`` the q/k/v/FFN
    biases ARE the trainable+FedAvg'd partition, and the contract here is
    that trainable partitions (plus their optimizer state, communication,
    and checkpoints) are never mesh-sharded.  GSPMD slices a replicated
    bias into the sharded activation add for free.

Requires ``num_heads % model_parallel == 0`` (and the FFN width likewise).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# (path-suffix tokens, kernel spec builder) — matched against the LAST
# path components of each flattened param.  Specs are built rank-aware:
# scanned stacks have a leading [L] axis that always stays unsharded.
_COLUMN_KERNELS = ("query/dense/kernel", "key/kernel", "key/dense/kernel",
                   "value/dense/kernel", "intermediate/kernel")
_ROW_KERNELS = ("out/kernel", "output/kernel")


def _joined(path) -> str:
    return "/".join(str(p) for p in path)


def tp_spec_for(path: Tuple, leaf) -> P:
    """PartitionSpec for one param under the ``model`` axis."""
    j = _joined(path)
    ndim = np.ndim(leaf)

    def dim_spec(shard_axis: int) -> P:
        # leading [L] scan axis (ndim == kernel rank + 1) stays unsharded
        spec = [None] * ndim
        spec[shard_axis] = MODEL_AXIS
        return P(*spec)

    # adapters/LoRA/prompts/heads stay replicated: their matmuls are tiny
    # and they are the trainable/communicated partitions
    if "adapter" in j or "lora" in j or "prompt" in j or "task_" in j or "/cls/" in f"/{j}/":
        return P()
    for suffix in _COLUMN_KERNELS:
        if j.endswith(suffix):
            return dim_spec(ndim - 1)  # shard output features
    for suffix in _ROW_KERNELS:
        if j.endswith(suffix) and ndim >= 2:
            return dim_spec(ndim - 2)  # shard input features
    return P()  # replicated: embeddings, norms, ALL biases, pooler, heads


def make_tp_mesh(
    model_parallel: int,
    data_parallel: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(data, model) mesh; ``data_parallel`` defaults to the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        if n % model_parallel != 0:
            raise ValueError(f"{n} devices not divisible by model={model_parallel}")
        data_parallel = n // model_parallel
    need = data_parallel * model_parallel
    if need > n:
        raise ValueError(f"need {need} devices, have {n}")
    grid = np.asarray(devices[:need]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def shard_params_tp(params, mesh: Mesh):
    """Place a param tree onto the mesh under the TP layout -> sharded tree."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = tp_spec_for(path, leaf)
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out)


def tp_forward(model, mesh: Mesh, task_key: Optional[str] = None):
    """Jitted data+tensor-parallel forward.  Batch arrays are sharded over
    ``data`` on their leading dim; GSPMD propagates the TP layout through
    the program and inserts the per-layer all-reduces.

    ViLT family (``task_key`` given): returns ``fn(params, batch) -> logits``.
    ALBEF (``task_key=None``): returns ``fn(params, batch) -> loss``."""
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def place_batch(batch):
        return {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}

    if task_key is not None:
        @jax.jit
        def fn(params, batch):
            _, logits = model.apply(
                {"params": params}, task_key, batch,
                adapter_mode="ensemble", deterministic=True,
            )
            return logits
    else:
        @jax.jit
        def fn(params, batch):
            loss, _ = model.apply(
                {"params": params}, batch,
                adapter_mode="ensemble", deterministic=True,
            )
            return loss

    return fn, place_batch
