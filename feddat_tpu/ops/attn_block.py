"""Pallas fused ATTENTION BLOCK for short sequences (frozen projections).

One kernel computes the whole pre-LN attention block of a transformer layer:

    xln   = LayerNorm(x)          (optional, fused: gb/ln_eps args)
    q/k/v = xln @ W_{q,k,v} + b   (three MXU dots, bf16 in / fp32 accum)
    ctx   = softmax(q k^T * scale + bias) v      (per-head, whole-S in VMEM)
    out   = ctx @ W_out + b_out

for the PEFT regime where the projection weights are FROZEN (FedDAT's
DAT/adapter/prompt modes — reference ``src/train/main.py:132-245`` freezes
the backbone in all of them): the backward returns d x only and **zero**
cotangents for the weights.  Do NOT route ``full``/``bias``/``lora``/
``freeze_bottom_k`` modes through this kernel — their optimizers would
silently see zero gradients for the projection params.  ``norm`` mode may
use it only WITHOUT the fused LN (create_model sets ``fuse_ln=False``
there, keeping the trainable LayerNorms outside the kernel).

Why this kernel exists: under full-layer remat XLA runs the attention
region as many small fusions with [B,S,H,D]<->[B,H,S,D] relayouts between
them; measured at ~74 TFLOP/s vs 111 for the FFN pair (PERF.md).  Fusing
the projections into the same Pallas call as the softmax keeps every
intermediate in VMEM, removes the transposes entirely (the head split is a
lane-slice of the [S, H*D] projection output), and turns the region into
exactly two kernel launches (fwd, bwd) per layer per pass.

Numerics match the XLA path with ``attention_logits_dtype=float32`` (the
model-config default): bf16 dot inputs, fp32 accumulation, the [SP, SP]
logits kept in fp32 end to end, fp32 softmax, bf16 probs into the PV dot —
the kernel never stores logits at bf16 (``models/layers.py`` documents the
same; the logits live in VMEM, so there is no HBM-traffic reason to).
No attention dropout (ViLT's default is 0.0).

Shapes: x [B, S, Dm]; weights [Dm, Dm]; bqkv [3, Dm] f32 (stacked q/k/v
biases); bo [1, Dm] f32; gb [2, Dm] f32 (LN scale/bias) or None; bias
[B, 1, 1, S] additive padding mask (compacted to a [B, 1, SP] row
internally) or None.  S is padded to a multiple of 16 and B to a multiple
of ``block_b``; padded keys are masked with NEG_INF, padded rows/elements
produce zeros in the backward.  Per grid step: ``block_b`` batch elements,
all heads streamed sequentially (per-head [SP, SP] fp32 logits tile); the
weights stay resident in VMEM across the grid.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Row-chunk size for the fused-LN f32 temporaries.  LayerNorm is row-local,
# so chunking rows bounds the peak f32 working set at ~6 x [LN_CHUNK, Dm]
# regardless of S — this is what lets LN stay fused at ALBEF's S=577 (the
# whole-S variant overflowed VMEM past S~448, PERF.md).
LN_CHUNK = 128


def _apply_ln(x_raw, gb_ref, ln_eps, out_dtype):
    """Fused pre-LN (fast-variance form, matching flax nn.LayerNorm):
    x_raw [SP, Dm] -> normalized bf16.  gb_ref: [2, Dm] f32 (scale, bias).
    Processes rows in LN_CHUNK chunks to bound f32 VMEM temporaries."""
    gb = gb_ref[...]

    def one(chunk):
        xr = chunk.astype(jnp.float32)
        mu = jnp.mean(xr, axis=1, keepdims=True)
        var = jnp.maximum(jnp.mean(xr * xr, axis=1, keepdims=True) - mu * mu, 0.0)
        rstd = jax.lax.rsqrt(var + ln_eps)
        xln = (xr - mu) * rstd * gb[0][None, :] + gb[1][None, :]
        return xln.astype(out_dtype)

    sp = x_raw.shape[0]
    if sp <= LN_CHUNK:
        return one(x_raw)
    return jnp.concatenate(
        [one(x_raw[r : r + LN_CHUNK]) for r in range(0, sp, LN_CHUNK)], axis=0
    )


def _fwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bqkv_ref, bo_ref,
                gb_ref, bias_ref, out_ref, ctx_ref, lse_ref,
                *, num_heads: int, scale: float, ln_eps):
    nb, sp, dm = x_ref.shape
    d = dm // num_heads
    for i in range(nb):
        x = x_ref[i]  # [SP, Dm] bf16
        if ln_eps is not None:
            x = _apply_ln(x, gb_ref, ln_eps, x.dtype)
        bqkv = bqkv_ref[...]  # [3, Dm] f32
        # dot -> +bias -> bf16 cast per projection so each f32 accumulator
        # dies before the next dot: peak stack 1x instead of 3x [SP, Dm] f32
        # (the 2 MB that used to tip S=592 over the 16 MB scoped-VMEM limit)
        q = (
            jax.lax.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
            + bqkv[0][None, :]
        ).astype(x.dtype)
        k = (
            jax.lax.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
            + bqkv[1][None, :]
        ).astype(x.dtype)
        v = (
            jax.lax.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
            + bqkv[2][None, :]
        ).astype(x.dtype)
        brow = bias_ref[i, 0].astype(jnp.float32)  # [SP]
        # per-head results are written straight into the ctx output block
        # (VMEM) — no concat, so peak VMEM stays ~one [SP, SP] tile per head
        # even at S=577 (ALBEF's ViT)
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [SP, SP]
            s = s * scale + brow[None, :]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            ch = jax.lax.dot(
                p.astype(x.dtype), vh, preferred_element_type=jnp.float32
            )
            ctx_ref[i, :, sl] = (ch / l).astype(x.dtype)
            lse_ref[i, h] = (m + jnp.log(l))[:, 0]
        ctx = ctx_ref[i]
        o = jax.lax.dot(ctx, wo_ref[...], preferred_element_type=jnp.float32)
        out_ref[i] = (o + bo_ref[...][0][None, :]).astype(out_ref.dtype)


def _bwd_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bqkv_ref,
                gb_ref, bias_ref, ctx_ref, lse_ref, g_ref, dx_ref,
                dq_s, dk_s, dv_s, *, num_heads: int, scale: float, ln_eps):
    nb, sp, dm = x_ref.shape
    d = dm // num_heads
    for i in range(nb):
        x = x_ref[i]
        if ln_eps is not None:
            x_raw = x
            x = _apply_ln(x, gb_ref, ln_eps, x.dtype)
        g = g_ref[i]  # [SP, Dm] bf16
        # d ctx = g @ Wout^T
        dctx = jax.lax.dot_general(
            g, wo_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        bqkv = bqkv_ref[...]
        # recompute q/k/v (flash-style: cheaper than storing them); see the
        # fwd kernel: interleaved dot->cast keeps only ONE f32 accumulator
        # live at a time
        q = (
            jax.lax.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
            + bqkv[0][None, :]
        ).astype(x.dtype)
        k = (
            jax.lax.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
            + bqkv[1][None, :]
        ).astype(x.dtype)
        v = (
            jax.lax.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
            + bqkv[2][None, :]
        ).astype(x.dtype)
        brow = bias_ref[i, 0].astype(jnp.float32)
        ctx = ctx_ref[i]
        # per-head d q/k/v go into VMEM scratch slices (no concat — see fwd)
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
            doh = dctx[:, sl]
            oh = ctx[:, sl]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            s = s * scale + brow[None, :]
            p = jnp.exp(s - lse_ref[i, h][:, None])
            pb = p.astype(x.dtype)
            dv_s[:, sl] = jax.lax.dot_general(
                pb, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            dp = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            delta = jnp.sum(
                doh.astype(jnp.float32) * oh.astype(jnp.float32), axis=1, keepdims=True
            )
            ds = (p * (dp - delta)).astype(x.dtype)
            dq_s[:, sl] = (
                jax.lax.dot(ds, kh, preferred_element_type=jnp.float32) * scale
            ).astype(x.dtype)
            dk_s[:, sl] = (
                jax.lax.dot_general(
                    ds, qh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            ).astype(x.dtype)
        # dx = dq Wq^T + dk Wk^T + dv Wv^T
        nt = (((1,), (1,)), ((), ()))
        dx = jax.lax.dot_general(dq_s[...], wq_ref[...], nt, preferred_element_type=jnp.float32)
        dx = dx + jax.lax.dot_general(dk_s[...], wk_ref[...], nt, preferred_element_type=jnp.float32)
        dx = dx + jax.lax.dot_general(dv_s[...], wv_ref[...], nt, preferred_element_type=jnp.float32)
        if ln_eps is not None:
            # dx above is d(loss)/d(LN output); convert through the LN
            # (frozen scale/bias -> no dgamma/dbeta).  Row-chunked like
            # _apply_ln to bound the f32 temporaries at long S.
            gamma = gb_ref[...][0][None, :]

            def ln_bwd_chunk(xc, dxc):
                xr = xc.astype(jnp.float32)
                mu = jnp.mean(xr, axis=1, keepdims=True)
                var = jnp.maximum(jnp.mean(xr * xr, axis=1, keepdims=True) - mu * mu, 0.0)
                rstd = jax.lax.rsqrt(var + ln_eps)
                xhat = (xr - mu) * rstd
                dxhat = dxc * gamma
                m1 = jnp.mean(dxhat, axis=1, keepdims=True)
                m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
                return rstd * (dxhat - m1 - xhat * m2)

            if sp <= LN_CHUNK:
                dx_ref[i] = ln_bwd_chunk(x_raw, dx).astype(dx_ref.dtype)
            else:
                # write each chunk straight into the output ref: a
                # concatenate would hold a SECOND full [SP, Dm] f32 buffer
                # live next to dx (1.8 MB at S=592 — exactly the scoped-VMEM
                # overflow margin)
                for r in range(0, sp, LN_CHUNK):
                    dx_ref[i, r : r + LN_CHUNK] = ln_bwd_chunk(
                        x_raw[r : r + LN_CHUNK], dx[r : r + LN_CHUNK]
                    ).astype(dx_ref.dtype)
            continue
        dx_ref[i] = dx.astype(dx_ref.dtype)


def _vmem_params(sp: int, block_b: int = 1):
    """Raise Mosaic's scoped-VMEM budget for long-S or wide-block grids.
    The 16 MiB default is a compiler soft limit, not the hardware (v5e has
    128 MiB of VMEM); the S=592 working set (resident weights +
    double-buffered windows + per-head f32 tiles) measures 16.2-18.3 MB —
    give those grids (and block_b>2 sweeps, whose tiles scale with the
    block) a 64 MiB ceiling and leave the standard short-S kernels on the
    default."""
    if sp <= 448 and block_b <= 2:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _prep(x, bias, block_b: int):
    """Pad S to a sublane multiple and B to a block multiple; compact bias."""
    b, s, dm = x.shape
    sp = _round_up(s, 16)
    bp = _round_up(b, block_b)
    if bias is None:
        brow = jnp.zeros((b, 1, s), jnp.float32)
    else:
        assert bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1, (
            "attn_block expects a [B, 1, 1, S] padding bias"
        )
        if bias.shape[0] == 1 and b > 1:  # batch-broadcast bias: expand
            bias = jnp.broadcast_to(bias, (b,) + bias.shape[1:])
        brow = bias.astype(jnp.float32).reshape(b, 1, s)
    if sp != s:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        brow = jnp.pad(brow, ((0, 0), (0, 0), (0, sp - s)), constant_values=NEG_INF)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))
        brow = jnp.pad(brow, ((0, bp - b), (0, 0), (0, 0)), constant_values=NEG_INF)
    return x, brow, b, s, sp, bp


def _fwd_call(x, wq, wk, wv, wo, bqkv, bo, gb, bias, num_heads, scale,
              block_b, interpret, ln_eps):
    xp, brow, b, s, sp, bp = _prep(x, bias, block_b)
    dm = x.shape[-1]
    if gb is None:
        gb = jnp.zeros((2, dm), jnp.float32)
    grid = (bp // block_b,)
    wspec = pl.BlockSpec((dm, dm), lambda i: (0, 0))
    out, ctx, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale, ln_eps=ln_eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),
            wspec, wspec, wspec, wspec,
            pl.BlockSpec((3, dm), lambda i: (0, 0)),
            pl.BlockSpec((1, dm), lambda i: (0, 0)),
            pl.BlockSpec((2, dm), lambda i: (0, 0)),
            pl.BlockSpec((block_b, 1, sp), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, num_heads, sp), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, sp, dm), x.dtype),
            jax.ShapeDtypeStruct((bp, sp, dm), x.dtype),
            jax.ShapeDtypeStruct((bp, num_heads, sp), jnp.float32),
        ),
        compiler_params=_vmem_params(sp, block_b),
        interpret=interpret,
    )(xp, wq, wk, wv, wo, bqkv, bo, gb, brow)
    return out[:b, :s], (xp, brow, ctx, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def attn_block(x, wq, wk, wv, wo, bqkv, bo, gb, bias,
               num_heads: int, scale: Optional[float] = None,
               block_b: int = 1, interpret: bool = False,
               ln_eps: Optional[float] = None):
    """Fused attention block (projections + MHA + out-projection), with an
    optional fused pre-LayerNorm (``gb`` = [2, Dm] f32 (scale, bias) and a
    static ``ln_eps``; pass both as None to take pre-normalized input).

    FROZEN-projection backward: returns d x only; the weight/bias/LN
    cotangents are zero (see module docstring — with ``ln_eps`` set this
    additionally excludes the ``norm`` PEFT mode).  ``bqkv`` is [3, Dm]
    (q/k/v biases stacked), ``bo`` is [1, Dm].
    """
    if scale is None:
        scale = (x.shape[-1] // num_heads) ** -0.5
    return _fwd_call(x, wq, wk, wv, wo, bqkv, bo, gb, bias, num_heads, scale,
                     block_b, interpret, ln_eps)[0]


def _attn_block_fwd(x, wq, wk, wv, wo, bqkv, bo, gb, bias,
                    num_heads, scale, block_b, interpret, ln_eps):
    if scale is None:
        scale = (x.shape[-1] // num_heads) ** -0.5
    out, (xp, brow, ctx, lse) = _fwd_call(
        x, wq, wk, wv, wo, bqkv, bo, gb, bias, num_heads, scale, block_b, interpret, ln_eps
    )
    # Tag the residuals so a selective-remat policy (remat_policy
    # "block_save": save_only_these_names('attn_x','attn_ctx','attn_lse',
    # 'attn_out')) can store them and skip re-running the forward kernel in
    # the backward scan.
    from jax.ad_checkpoint import checkpoint_name

    xp = checkpoint_name(xp, "attn_x")
    ctx = checkpoint_name(ctx, "attn_ctx")
    lse = checkpoint_name(lse, "attn_lse")
    return out, (xp, brow, ctx, lse, wq, wk, wv, wo, bqkv, bo, gb, bias, x.shape)


# Longest S at which the BACKWARD kernel may keep the LN conversion fused
# (the fused bwd's stack overflows the 16 MB scoped-VMEM limit past ~S=448;
# beyond it the LN halves run in XLA around the compile-proven non-LN
# kernel — the forward stays fully fused either way, which is where the
# block_save residual win lives: `attn_x` aliases the residual-stream input).
LN_BWD_FUSED_MAX_S = 448


def _attn_block_bwd(num_heads, scale, block_b, interpret, ln_eps, res, g):
    xp, brow, ctx, lse, wq, wk, wv, wo, bqkv, bo, gb, bias, xshape = res
    b, s, dm = xshape
    if scale is None:
        scale = (dm // num_heads) ** -0.5
    bp, sp, _ = xp.shape
    gp = g
    if (sp != s) or (bp != b):
        gp = jnp.pad(g, ((0, bp - b), (0, sp - s), (0, 0)))
    grid = (bp // block_b,)
    gb_arr = gb if gb is not None else jnp.zeros((2, dm), jnp.float32)
    ln_outside = ln_eps is not None and sp > LN_BWD_FUSED_MAX_S
    if ln_outside:
        # recompute the (frozen) LN in XLA; feed the normalized input to the
        # non-LN kernel, convert dx back through the LN below
        xr = xp.astype(jnp.float32)
        mu = jnp.mean(xr, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(xr * xr, axis=-1, keepdims=True) - mu * mu, 0.0)
        rstd = jax.lax.rsqrt(var + ln_eps)
        xhat = (xr - mu) * rstd
        kernel_x = (xhat * gb_arr[0] + gb_arr[1]).astype(xp.dtype)
        kern_ln_eps = None
    else:
        kernel_x = xp
        kern_ln_eps = ln_eps
    wspec = pl.BlockSpec((dm, dm), lambda i: (0, 0))
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale, ln_eps=kern_ln_eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),
            wspec, wspec, wspec, wspec,
            pl.BlockSpec((3, dm), lambda i: (0, 0)),
            pl.BlockSpec((2, dm), lambda i: (0, 0)),
            pl.BlockSpec((block_b, 1, sp), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, num_heads, sp), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, sp, dm), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((sp, dm), g.dtype),
            pltpu.VMEM((sp, dm), g.dtype),
            pltpu.VMEM((sp, dm), g.dtype),
        ],
        compiler_params=_vmem_params(sp, block_b),
        interpret=interpret,
    )(kernel_x, wq, wk, wv, wo, bqkv, gb_arr, brow, ctx, lse, gp)
    if ln_outside:
        dxf = dx.astype(jnp.float32)
        dxhat = dxf * gb_arr[0]
        m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = (rstd * (dxhat - m1 - xhat * m2)).astype(dx.dtype)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, (wq, wk, wv, wo, bqkv, bo))
    dgb = None if gb is None else jnp.zeros_like(gb)
    dbias = None if bias is None else jnp.zeros_like(bias)
    return (dx[:b, :s], *zeros, dgb, dbias)


attn_block.defvjp(_attn_block_fwd, _attn_block_bwd)
