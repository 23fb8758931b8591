"""Pallas flash attention (TPU).

Online-softmax blocked attention: never materializes the [S_q, S_kv] prob
matrix in HBM.  The multimodal VQA sequences (<= ~620 tokens) fit the XLA
path fine (``ops.attention``); this kernel is the long-sequence scaling path
SURVEY.md §5.7 calls for — selectable via ``impl='flash'`` without any model
change.

Forward runs as a Pallas kernel (grid over batch*heads x q-blocks, fori_loop
over kv-blocks with running max/sum); backward is a jax/XLA recompute VJP —
the standard memory-saving trade (recompute attention in the backward
instead of saving probs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_kv: int, scale: float):
    """One (batch*head, q-block) tile: online softmax over kv blocks.

    Block shapes carry a leading singleton (batch*head) dim:
    q_ref: [1, Bq, D]; k_ref/v_ref: [1, Skv, D]; bias_ref: [1, Bq, Skv].
    """
    q = q_ref[0].astype(jnp.float32) * scale
    skv = k_ref.shape[1]
    num_kv = skv // block_kv
    bq, d = q.shape

    def body(i, carry):
        m_prev, l_prev, acc = carry
        kv_slice = pl.ds(i * block_kv, block_kv)
        k = k_ref[0, kv_slice, :].astype(jnp.float32)
        v = v_ref[0, kv_slice, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Bq, block_kv]
        s = s + bias_ref[0, :, kv_slice].astype(jnp.float32)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, multiple, value=0.0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value), size


def _flash_forward(q, k, v, bias, scale, block_q=128, block_kv=128, interpret=False):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if bias is None:
        bias = jnp.zeros((b, 1, 1, skv), jnp.float32)
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, h, sq, skv))

    # flatten (b, h) and pad sequence dims to block multiples
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    bf = bias.reshape(b * h, sq, skv)

    qf, sq0 = _pad_to(qf, 1, block_q)
    kf, skv0 = _pad_to(kf, 1, block_kv)
    vf, _ = _pad_to(vf, 1, block_kv)
    bf, _ = _pad_to(bf, 1, block_q)
    bf, _ = _pad_to(bf, 2, block_kv, value=NEG_INF)  # padded kv -> masked out

    bh, sq_p, _ = qf.shape
    skv_p = kf.shape[1]
    grid = (bh, sq_p // block_q)

    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_kv=block_kv, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, skv_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, skv_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, skv_p), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), v.dtype),
        interpret=interpret,
    )(qf, kf, vf, bf)
    return out[:, :sq0].reshape(b, h, sq0, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, bias=None, scale: Optional[float] = None, interpret: bool = False):
    """[B, H, S, D] flash attention with additive bias."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_forward(q, k, v, bias, scale, interpret=interpret)


def _flash_fwd(q, k, v, bias, scale, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out = _flash_forward(q, k, v, bias, scale, interpret=interpret)
    return out, (q, k, v, bias)


def _flash_bwd(scale, interpret, res, g):
    """Recompute backward in XLA (memory-light: probs rebuilt per use)."""
    q, k, v, bias = res
    if scale is None:
        scale = q.shape[-1] ** -0.5

    def ref(q, k, v, bias):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        if bias is not None:
            s = s + bias.astype(s.dtype)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    if bias is None:
        dq, dk, dv = jax.vjp(lambda q, k, v: ref(q, k, v, None), q, k, v)[1](g)
        return dq, dk, dv, None
    dq, dk, dv, db = jax.vjp(ref, q, k, v, bias)[1](g)
    return dq, dk, dv, db


flash_attention.defvjp(_flash_fwd, _flash_bwd)
