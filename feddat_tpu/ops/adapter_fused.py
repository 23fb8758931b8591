"""Pallas fused DAT-ensemble adapter epilogue.

The DAT ensemble forward evaluates two bottleneck adapters and mixes them
with fixed weights at every layer output (``adapter.py:133-146``):

    out = h + w * up_a(relu(down_a(h))) + (1-w) * up_b(relu(down_b(h)))

XLA emits this as 4 small matmuls + elementwise glue per layer; this kernel
fuses the whole epilogue into one VMEM-resident pass over token blocks (both
adapters' weights are tiny — d x d/r — and stay on-chip), eliminating the
intermediate HBM round-trips.  Backward is an XLA recompute VJP (the
bottleneck activations are cheap to rebuild).

The kernel returns the MIX (the adapter delta) only, NOT ``h + mix``: the
caller owns the residual convention, and returning ``h + mix`` at bf16
would force it to recover the delta as ``fused - h`` — a catastrophic
cancellation (bf16 ULP at residual-stream magnitude |h|~10 is ~0.06,
the same order as the delta itself).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(h_ref, wda_ref, bda_ref, wua_ref, bua_ref, wdb_ref, bdb_ref, wub_ref, bub_ref, o_ref, *, weight: float):
    h = h_ref[:]
    hf = h.astype(jnp.float32)

    def branch(wd, bd, wu, bu):
        down = jax.lax.dot_general(
            hf, wd[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bd[:].astype(jnp.float32)
        down = jnp.maximum(down, 0.0)
        return jax.lax.dot_general(
            down, wu[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bu[:].astype(jnp.float32)

    a = branch(wda_ref, bda_ref, wua_ref, bua_ref)
    b = branch(wdb_ref, bdb_ref, wub_ref, bub_ref)
    o_ref[:] = (weight * a + (1.0 - weight) * b).astype(o_ref.dtype)


def _forward(h, params_a, params_b, weight, block_rows=256, interpret=False):
    wda, bda, wua, bua = params_a
    wdb, bdb, wub, bub = params_b
    orig_shape = h.shape
    d = orig_shape[-1]
    flat = h.reshape(-1, d)
    n = flat.shape[0]
    pad = (-n) % block_rows
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    grid = (flat.shape[0] // block_rows,)
    r = wda.shape[1]

    out = pl.pallas_call(
        functools.partial(_kernel, weight=float(weight)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((d, r), lambda i: (0, 0)),
            pl.BlockSpec((r,), lambda i: (0,)),
            pl.BlockSpec((r, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d, r), lambda i: (0, 0)),
            pl.BlockSpec((r,), lambda i: (0,)),
            pl.BlockSpec((r, d), lambda i: (0, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, h.dtype),
        interpret=interpret,
    )(flat, wda, bda, wua, bua, wdb, bdb, wub, bub)
    return out[:n].reshape(orig_shape)


def _reference(h, params_a, params_b, weight):
    wda, bda, wua, bua = params_a
    wdb, bdb, wub, bub = params_b
    hf = h.astype(jnp.float32)

    def branch(wd, bd, wu, bu):
        return jnp.maximum(hf @ wd + bd, 0.0) @ wu + bu

    out = weight * branch(wda, bda, wua, bua) + (1.0 - weight) * branch(wdb, bdb, wub, bub)
    return out.astype(h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_ensemble_adapter(h, params_a, params_b, weight: float = 0.5, interpret: bool = False):
    """``w*adapter_a(h) + (1-w)*adapter_b(h)`` — the ensemble DELTA; the
    caller adds the residual (and applies ``spec.scaling``).

    ``params_*`` = (w_down [d, r], b_down [r], w_up [r, d], b_up [d]).
    """
    return _forward(h, params_a, params_b, weight, interpret=interpret)


def _fwd(h, params_a, params_b, weight, interpret):
    return _forward(h, params_a, params_b, weight, interpret=interpret), (h, params_a, params_b)


def _bwd(weight, interpret, res, g):
    h, params_a, params_b = res
    _, vjp = jax.vjp(lambda h, a, b: _reference(h, a, b, weight), h, params_a, params_b)
    return vjp(g)


fused_ensemble_adapter.defvjp(_fwd, _bwd)
