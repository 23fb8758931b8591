"""Pallas flash attention (TPU).

Online-softmax blocked attention: never materializes the [S_q, S_kv] prob
matrix in HBM — in EITHER direction.  The multimodal VQA sequences
(<= ~620 tokens) fit the XLA path fine (``ops.attention``); this kernel is
the long-sequence scaling path SURVEY.md §5.7 calls for — selectable via
``impl='flash'`` without any model change.

Forward: grid over (batch*heads, q-blocks), fori_loop over kv-blocks with
running max/sum; saves the per-row logsumexp.  Backward: the standard
two-kernel flash backward — one grid over q-blocks accumulating dQ, one
over kv-blocks accumulating dK/dV, both rebuilding P tiles from the saved
logsumexp so the [S, S] matrices stay in VMEM.

The additive ``bias`` is kept COMPACT end to end: broadcast dimensions
(batch/head/query) keep size 1 and are collapsed in the BlockSpec index
maps instead of materializing the [B, H, S_q, S_kv] broadcast in HBM (at
B=8, H=12, S=4096 that broadcast alone is 6.4 GB of fp32 — the exact
O(S^2) HBM cost this kernel exists to avoid).  The bias is treated as a
CONSTANT (padding/causal masks); its cotangent is zero, like
``fused_attention``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                      block_kv: int, scale: float):
    """One (batch*head, q-block) tile: online softmax over kv blocks.

    Block shapes carry a leading singleton (batch*head) dim:
    q_ref: [1, Bq, D]; k_ref/v_ref: [1, Skv, D]; bias_ref: [1, bq_blk, Skv]
    with bq_blk in {1, Bq} (1 = bias row broadcast over queries).
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
    lse_ref[0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, *, block_kv: int, scale: float):
    """dQ for one (batch*head, q-block) tile, streaming kv blocks."""
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, None]      # [Bq, 1]
    delta = delta_ref[0][:, None]  # [Bq, 1]
    skv = k_ref.shape[1]
    num_kv = skv // block_kv
    bq, d = q.shape

    def body(i, acc):
        kv_slice = pl.ds(i * block_kv, block_kv)
        k = k_ref[0, kv_slice, :].astype(jnp.float32)
        v = v_ref[0, kv_slice, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + bias_ref[0, :, kv_slice].astype(jnp.float32)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, *, block_q: int,
                          scale: float):
    """dK/dV for one (batch*head, kv-block) tile, streaming q blocks.

    bias_ref here is [1, bq_blk, block_kv] with bq_blk in {1, Sq}."""
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    sq = q_ref.shape[1]
    num_q = sq // block_q
    bkv, d = k.shape
    bias_rows = bias_ref.shape[1]

    def body(i, carry):
        dk, dv = carry
        q_slice = pl.ds(i * block_q, block_q)
        q = q_ref[0, q_slice, :].astype(jnp.float32) * scale
        do = do_ref[0, q_slice, :].astype(jnp.float32)
        lse = lse_ref[0, q_slice][:, None]
        delta = delta_ref[0, q_slice][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_kv]
        if bias_rows == 1:
            s = s + bias_ref[0].astype(jnp.float32)
        else:
            s = s + bias_ref[0, q_slice, :].astype(jnp.float32)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    zero = jnp.zeros((bkv, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (zero, zero))
    # q was pre-scaled, so ds^T q already carries `scale`
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_to(x, axis, multiple, value=0.0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value), size


def _prep_bias(bias, b, h, sq, skv, block_q, block_kv):
    """Compact-bias plumbing shared by fwd and bwd.

    Returns (bias3 [nb, bq_dim_padded, skv_p], idx0(i), bq_blk) where idx0
    collapses the broadcast (batch, head) dims of the flattened b*h grid
    axis and bq_blk is the q-dim block size (1 = broadcast over queries).
    """
    if bias is None:
        bias = jnp.zeros((1, 1, 1, skv), jnp.float32)
    assert bias.ndim == 4, "bias must be [B|1, H|1, Sq|1, Skv]-broadcastable"
    bb, bh, bq, bk = bias.shape
    assert bb in (1, b) and bh in (1, h) and bq in (1, sq), (
        f"bias {bias.shape} not broadcastable to {(b, h, sq, skv)}"
    )
    bias = bias.astype(jnp.float32)
    if bk == 1:
        # a size-1 kv dim cannot express the NEG_INF masking of padded kv
        # columns; expand it (S_kv is the only dim that must be real)
        bias = jnp.broadcast_to(bias, (bb, bh, bq, skv))
    else:
        assert bk == skv, f"bias kv dim {bk} != {skv}"
    bias = bias.reshape(bb * bh, bq, skv)
    bias, _ = _pad_to(bias, 2, block_kv, value=NEG_INF)  # padded kv -> masked
    if bq > 1:
        bias, _ = _pad_to(bias, 1, block_q)

    if bb == 1 and bh == 1:
        idx0 = lambda i: 0
    elif bh == 1:
        idx0 = lambda i: i // h
    elif bb == 1:
        idx0 = lambda i: i % h
    else:
        idx0 = lambda i: i
    return bias, idx0, (block_q if bq > 1 else 1)


def _flash_forward(q, k, v, bias, scale, block_q=128, block_kv=128,
                   interpret=False, need_lse=False):
    b, h, sq, d = q.shape
    skv = k.shape[2]

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    qf, sq0 = _pad_to(qf, 1, block_q)
    kf, _ = _pad_to(kf, 1, block_kv)
    vf, _ = _pad_to(vf, 1, block_kv)
    bh_n, sq_p, _ = qf.shape
    skv_p = kf.shape[1]

    bf, idx0, bq_blk = _prep_bias(bias, b, h, sq, skv, block_q, block_kv)
    grid = (bh_n, sq_p // block_q)

    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_kv=block_kv, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, skv_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, skv_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(
                (1, bq_blk, skv_p),
                lambda i, j: (idx0(i), j if bq_blk > 1 else 0, 0),
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q), lambda i, j: (i, j)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh_n, sq_p, d), v.dtype),
            jax.ShapeDtypeStruct((bh_n, sq_p), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf, bf)
    o = out[:, :sq0].reshape(b, h, sq0, d)
    if need_lse:
        return o, lse
    return o


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, bias=None, scale: Optional[float] = None, interpret: bool = False):
    """[B, H, S, D] flash attention with additive (constant) bias."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_forward(q, k, v, bias, scale, interpret=interpret)


def _flash_fwd(q, k, v, bias, scale, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, lse = _flash_forward(q, k, v, bias, scale, interpret=interpret,
                              need_lse=True)
    return out, (q, k, v, bias, out, lse)


def _flash_bwd(scale, interpret, res, g, block_q=128, block_kv=128):
    """Blocked flash backward: P tiles rebuilt from the saved logsumexp; no
    [S, S] HBM materialization.  bias cotangent is zero (constant masks)."""
    q, k, v, bias, o, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, sq, d = q.shape
    skv = k.shape[2]

    # delta = rowsum(dO * O) — [b*h, sq], cheap in XLA
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = delta.reshape(b * h, sq)

    qf, sq0 = _pad_to(q.reshape(b * h, sq, d), 1, block_q)
    dof, _ = _pad_to(g.reshape(b * h, sq, d), 1, block_q)
    deltaf, _ = _pad_to(delta, 1, block_q)
    kf, skv0 = _pad_to(k.reshape(b * h, skv, d), 1, block_kv)
    vf, _ = _pad_to(v.reshape(b * h, skv, d), 1, block_kv)
    bh_n, sq_p, _ = qf.shape
    skv_p = kf.shape[1]
    # lse is already [b*h, sq_p] from the fwd; padded q rows carry the
    # bias-only logsumexp, but their q/do/delta rows are zero so every
    # padded-row contribution below is zero.

    bf, idx0, bq_blk = _prep_bias(bias, b, h, sq, skv, block_q, block_kv)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_kv=block_kv, scale=scale),
        grid=(bh_n, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, skv_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, skv_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(
                (1, bq_blk, skv_p),
                lambda i, j: (idx0(i), j if bq_blk > 1 else 0, 0),
            ),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q), lambda i, j: (i, j)),
            pl.BlockSpec((1, block_q), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh_n, sq_p, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bf, dof, lse, deltaf)

    # bias block for the dkv grid: full (padded) q rows x one kv block
    bq_full = bf.shape[1] if bq_blk > 1 else 1
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, scale=scale),
        grid=(bh_n, skv_p // block_kv),
        in_specs=[
            pl.BlockSpec((1, sq_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec(
                (1, bq_full, block_kv), lambda i, j: (idx0(i), 0, j)
            ),
            pl.BlockSpec((1, sq_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sq_p), lambda i, j: (i, 0)),
            pl.BlockSpec((1, sq_p), lambda i, j: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh_n, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh_n, skv_p, d), v.dtype),
        ),
        interpret=interpret,
    )(qf, kf, vf, bf, dof, lse, deltaf)

    dq = dq[:, :sq0].reshape(b, h, sq0, d)
    dk = dk[:, :skv0].reshape(b, h, skv0, d)
    dv = dv[:, :skv0].reshape(b, h, skv0, d)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)
