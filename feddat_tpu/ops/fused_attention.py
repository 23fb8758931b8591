"""Pallas fused attention for SHORT sequences (whole-sequence-in-VMEM).

The multimodal VQA workload runs attention at S ~ 185-640 tokens — short
enough that one batch element's ENTIRE multi-head Q/K/V/S/P tile set fits
VMEM.  The kernel fuses QK^T + bias + softmax + PV in the forward (saving
only the logsumexp) and runs the full FlashAttention-style backward as a
second Pallas kernel (recompute P from the saved logsumexp; dV = P^T dO;
dS = P*(dP - rowsum(dO*O)); dQ = dS K; dK = dS^T Q) — so the [S, S]
probability matrices never touch HBM in either direction.

Grid layout (v2): ONE grid step per batch element processing ALL heads as a
batched dot_general — v1's per-(b, h) cells serialized 768 tiny
[S, D]-tile steps at B=64/H=12 and lost to XLA (375 vs 466 samples/s); a
per-b block amortizes grid/DMA overhead 12x and shares the single padding
bias row for the whole block.

Selected via ``attn_impl='fused'``; no attention-dropout support (ViLT's
default).  The additive ``bias`` is treated as a constant (padding masks),
its cotangent is zero.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# batch-of-heads matmul helpers: operands [H, S, D] / [H, S, S]
_QK = (((2,), (2,)), ((0,), (0,)))  # q [H,Sq,D] x k [H,Sk,D] -> [H,Sq,Sk]
_PV = (((2,), (1,)), ((0,), (0,)))  # p [H,Sq,Sk] x v [H,Sk,D] -> [H,Sq,D]
_PT_DO = (((1,), (1,)), ((0,), (0,)))  # p [H,Sq,Sk] x do [H,Sq,D] -> [H,Sk,D]


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale: float):
    # keep the dot INPUTS in bf16 (native MXU rate) and accumulate fp32 —
    # upcasting the operands first would force fp32 MXU passes at a
    # fraction of the bf16 throughput, exactly like XLA's
    # ``preferred_element_type`` contract
    q = q_ref[0]  # [H, S, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, _QK, preferred_element_type=jnp.float32)
    # bias is the compact [1, 1, S] padding-mask row of THIS batch element,
    # broadcast over (heads, queries) ON-CHIP (materializing [B, H, S, S]
    # in HBM costs more than the matmuls)
    s = s * scale + bias_ref[0].astype(jnp.float32)[None, :, :]
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, _PV, preferred_element_type=jnp.float32
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l))[:, :, 0]


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    # bf16 dot inputs + fp32 accumulation (see _fwd_kernel)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :, None]  # [H, S, 1]

    s = jax.lax.dot_general(q, k, _QK, preferred_element_type=jnp.float32)
    s = s * scale + bias_ref[0].astype(jnp.float32)[None, :, :]
    p = jnp.exp(s - lse)
    pb = p.astype(v.dtype)

    dv = jax.lax.dot_general(pb, do, _PT_DO, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, _QK, preferred_element_type=jnp.float32)
    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32), axis=2, keepdims=True
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, _PT_DO, preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bias_rows(bias, b, skv):
    """Only [B, 1, 1, S]-broadcastable padding biases are supported in the
    fast path (the model's masks)."""
    if bias is None:
        return jnp.zeros((b, 1, skv), jnp.float32)
    assert bias.shape[1] == 1 and bias.shape[2] == 1, (
        "fused path expects a [B, 1, 1, S] padding bias"
    )
    if bias.shape[0] == 1 and b > 1:  # batch-broadcast bias: expand, not crash
        bias = jnp.broadcast_to(bias, (b,) + bias.shape[1:])
    return bias.astype(jnp.float32).reshape(b, 1, skv)


def _fwd_call(q, k, v, bias, scale, interpret):
    b, h, s, d = q.shape
    assert k.shape[2] == s, "fused short-seq kernel expects self-attention shapes"
    bf = _bias_rows(bias, b, s)
    spec4 = pl.BlockSpec((1, h, s, d), lambda i: (i, 0, 0, 0))
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b,),
        in_specs=[
            spec4, spec4, spec4,
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
        ],
        out_specs=(spec4, pl.BlockSpec((1, h, s), lambda i: (i, 0, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s, d), v.dtype),
            jax.ShapeDtypeStruct((b, h, s), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v, bf)
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_short_attention(q, k, v, bias=None, scale: Optional[float] = None, interpret: bool = False):
    """Self-attention [B, H, S, D] with whole-S VMEM tiles, fwd+bwd in Pallas."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _fwd_call(q, k, v, bias, scale, interpret)[0]


def _fused_fwd(q, k, v, bias, scale, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    o, lse = _fwd_call(q, k, v, bias, scale, interpret)
    return o, (q, k, v, bias, o, lse)


def _fused_bwd(scale, interpret, res, g):
    q, k, v, bias, o, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, s, d = q.shape
    bf = _bias_rows(bias, b, s)
    spec4 = pl.BlockSpec((1, h, s, d), lambda i: (i, 0, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b,),
        in_specs=[
            spec4, spec4, spec4,
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
            spec4, spec4,
            pl.BlockSpec((1, h, s), lambda i: (i, 0, 0)),
        ],
        out_specs=(spec4, spec4, spec4),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), v.dtype),
        ),
        interpret=interpret,
    )(q, k, v, bf, o, g, lse)
    return dq, dk, dv, None


fused_short_attention.defvjp(_fused_fwd, _fused_bwd)
