"""Pallas WHOLE-LAYER backward for short sequences (frozen backbone).

One custom-vjp op computes the entire pre-LN transformer layer

    h   = x + attn_block(x)          (LN1 fused into the attention kernel)
    m   = LayerNorm2(h)
    f   = gelu(m @ W1 + b1) @ W2 + b2
    o   = h + f
    out = o + adapter_delta(o)       (single adapter or fixed-0.5 ensemble)

with a plain-JAX forward (the attention goes through the proven
``attn_block`` forward kernel, whose ctx/lse residuals we keep) and ONE
Pallas backward kernel per layer per pass that does, entirely in VMEM:

    adapter bwd (REAL weight cotangents for the trainable adapter)
    -> FFN forward recompute + backward (frozen W1/W2 -> dx only)
    -> LN2 backward (frozen scale/bias)
    -> attention backward incl. the fused LN1 (the attn_block bwd math)

Why: under ``block_save_nox`` remat the backward scan re-runs LN2/FFN/adapter
in XLA per layer, materializing every intermediate (h, m, p1, gelu, f, o —
~150 MB/layer at B=48) through HBM between fusions; PERF.md's round-3 trace
shows the backward scans at 60% of the step with no single fusable region
left for XLA.  This kernel removes those HBM round-trips and the remat
machinery entirely: the vjp saves exactly (x, ctx, lse, attn_out) per layer
— the same set ``block_save`` kept — so the layer stack runs WITHOUT
``jax.checkpoint``.

Contract (a superset of ``attn_block``'s): projections, LayerNorms and FFN
weights are FROZEN (zero cotangents); the ACTIVE adapter's down/up
weights/biases get REAL gradients; the ensemble's second member (DAT's
frozen ``adapter_2`` teacher) gets zeros.  Supported adapter modes: a single
named adapter or the fixed-weight two-member ensemble; ``weighted``/``init``
callers must use the composable path.  No dropout (ViLT's default 0.0) — the
eligibility gate in ``models/layers.py`` enforces all of this.

Reference behavior being accelerated: the DAT/adapter train step over the
frozen ViLT backbone (``src/train/visionlanguage_tasks/task_trainer.py:280-330``,
adapter sites ``src/modeling/adaptered_output.py:67-79``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feddat_tpu.ops.attn_block import _fwd_call, _prep

SQRT_2 = 1.4142135623730951
INV_SQRT_2PI = 0.3989422804014327

# Longest S at which the FORWARD keeps LN1 fused into the attention kernel.
# The fused-LN forward wins only in the short-S regime (+2% at ViLT's
# S<=281, PERF.md); at ALBEF's S=577 it measured a 21% loss in
# forward-only programs (rank-answer eval 312 -> 248 q/s, PERF.md round 4)
# — the kernel's in-VMEM LN serializes against the first projection matmul
# at large SP.  Past this cap the forward computes LN1 in XLA (which
# overlaps it with the previous layer's epilogue) and calls the plain
# kernel; the BACKWARD is unaffected either way — it recomputes LN1 from
# the saved pre-LN ``x`` inside the backward kernel.
LN_FWD_FUSED_MAX_S = 448


def _ln_fwd_f32(x, gamma, beta, eps):
    """flax nn.LayerNorm math (fast-variance form, f32 internals)."""
    xr = x.astype(jnp.float32)
    mu = jnp.mean(xr, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xr * xr, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xr - mu) * rstd
    return xhat * gamma + beta, xhat, rstd


def _ln_bwd_f32(dy, xhat, rstd, gamma):
    """d x for a frozen-scale LayerNorm (dgamma/dbeta not needed)."""
    dxhat = dy.astype(jnp.float32) * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rstd * (dxhat - m1 - xhat * m2)


def _gelu_exact(x):
    """Exact (erf) GELU — XLA-side only (Mosaic has no erf lowering)."""
    return 0.5 * x * (1.0 + jax.lax.erf(x / SQRT_2))


def _erf_f32(x):
    """f32 erf as the Eigen/XLA rational polynomial (odd-poly numerator /
    even-poly denominator on x clamped to [-4, 4]; max abs error vs
    ``lax.erf`` measured at 6.0e-7).  Mosaic lowers no ``erf`` primitive,
    so the kernel carries its own — same formula XLA expands erf to on
    backends without a native op."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    a = jnp.float32(-2.72614225801306e-10)
    a = a * x2 + jnp.float32(2.77068142495902e-08)
    a = a * x2 + jnp.float32(-2.10102402082508e-06)
    a = a * x2 + jnp.float32(-5.69250639462346e-05)
    a = a * x2 + jnp.float32(-7.34990630326855e-04)
    a = a * x2 + jnp.float32(-2.95459980854025e-03)
    a = a * x2 + jnp.float32(-1.60960333262415e-02)
    a = a * x
    b = jnp.float32(-1.45660718464996e-05)
    b = b * x2 + jnp.float32(-2.13374055278905e-04)
    b = b * x2 + jnp.float32(-1.68282697438203e-03)
    b = b * x2 + jnp.float32(-7.37332916720468e-03)
    b = b * x2 + jnp.float32(-1.42647390514189e-02)
    return a / b


def _gelu_kernel(x):
    """In-kernel exact GELU via the erf polynomial (f32)."""
    return 0.5 * x * (1.0 + _erf_f32(x * jnp.float32(1.0 / SQRT_2)))


def _gelu_grad(x):
    """In-kernel d gelu/dx via the erf polynomial (f32)."""
    return 0.5 * (1.0 + _erf_f32(x * jnp.float32(1.0 / SQRT_2))) + x * jnp.exp(-0.5 * x * x) * INV_SQRT_2PI


def _layer_bwd_kernel(
    # inputs
    x_ref, aout_ref, ctx_ref, lse_ref, g_ref, brow_ref,
    wq_ref, wk_ref, wv_ref, wo_ref, bqkv_ref, gb1_ref, gb2_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    wda_ref, bda_ref, wua_ref, bua_ref,
    wdb_ref, bdb_ref, wub_ref, bub_ref,
    # outputs
    dx_ref, dwda_ref, dbda_ref, dwua_ref, dbua_ref,
    # scratch
    dq_s, dk_s, dv_s,
    *, num_heads: int, scale: float, ln_eps1, ln_eps2,
    w_a: float, w_b: float, use_b: bool,
):
    """One batch-block of the whole-layer backward (see module docstring).

    ``w_a``/``w_b``: the ACTIVE adapter's and the ensemble partner's total
    forward scaling (ensemble_weight x spec.scaling; single mode: w_a=1,
    use_b=False).  Adapter-weight grads accumulate across the grid (TPU
    grids run sequentially)."""
    nb, sp, dm = x_ref.shape
    d = dm // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwda_ref[...] = jnp.zeros_like(dwda_ref)
        dbda_ref[...] = jnp.zeros_like(dbda_ref)
        dwua_ref[...] = jnp.zeros_like(dwua_ref)
        dbua_ref[...] = jnp.zeros_like(dbua_ref)

    gamma1 = gb1_ref[...][0][None, :]
    beta1 = gb1_ref[...][1][None, :]
    gamma2 = gb2_ref[...][0][None, :]
    beta2 = gb2_ref[...][1][None, :]
    for i in range(nb):
        x = x_ref[i]           # [SP, Dm] bf16 (pre-LN1 layer input)
        g = g_ref[i]           # [SP, Dm] d out
        h = (x.astype(jnp.float32) + aout_ref[i].astype(jnp.float32)).astype(x.dtype)

        # ---- recompute m = LN2(h), p1, gelu, o ----------------------------
        m32, xhat2, rstd2 = _ln_fwd_f32(h, gamma2, beta2, ln_eps2)
        m = m32.astype(x.dtype)
        p1 = (
            jax.lax.dot(m, w1_ref[...], preferred_element_type=jnp.float32)
            + b1_ref[...][0][None, :]
        )  # [SP, F] f32
        ge = _gelu_kernel(p1).astype(x.dtype)
        f = (
            jax.lax.dot(ge, w2_ref[...], preferred_element_type=jnp.float32)
            + b2_ref[...][0][None, :]
        ).astype(x.dtype)
        o = (h.astype(jnp.float32) + f.astype(jnp.float32)).astype(x.dtype)

        # ---- adapter backward (REAL grads for the active adapter) --------
        # fwd: out = o + w_a * up_a(relu(down_a(o))) [+ w_b * (frozen b path)]
        down_a = (
            jax.lax.dot(o, wda_ref[...], preferred_element_type=jnp.float32)
            + bda_ref[...][0][None, :]
        )  # [SP, Bt] f32
        relu_a = jnp.maximum(down_a, 0.0).astype(x.dtype)
        g_delta_a = (g.astype(jnp.float32) * w_a).astype(x.dtype)  # [SP, Dm]
        # d wu_a += relu_a^T @ g_delta_a ; d bu_a += sum rows
        dwua_ref[...] += jax.lax.dot_general(
            relu_a, g_delta_a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbua_ref[...] += jnp.sum(g_delta_a.astype(jnp.float32), axis=0, keepdims=True)
        g_relu_a = jax.lax.dot_general(
            g_delta_a, wua_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [SP, Bt] f32
        g_down_a = jnp.where(down_a > 0.0, g_relu_a, 0.0)
        dwda_ref[...] += jax.lax.dot_general(
            o, g_down_a.astype(x.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbda_ref[...] += jnp.sum(g_down_a, axis=0, keepdims=True)
        g_o = g.astype(jnp.float32) + jax.lax.dot_general(
            g_down_a.astype(x.dtype), wda_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if use_b:
            # frozen partner (DAT's adapter_2 teacher): contributes to d o
            # but gets no weight grads
            down_b = (
                jax.lax.dot(o, wdb_ref[...], preferred_element_type=jnp.float32)
                + bdb_ref[...][0][None, :]
            )
            g_delta_b = (g.astype(jnp.float32) * w_b).astype(x.dtype)
            g_relu_b = jax.lax.dot_general(
                g_delta_b, wub_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g_down_b = jnp.where(down_b > 0.0, g_relu_b, 0.0)
            g_o = g_o + jax.lax.dot_general(
                g_down_b.astype(x.dtype), wdb_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # ---- FFN backward (frozen weights -> d m only) --------------------
        g_f = g_o.astype(x.dtype)
        g_ge = jax.lax.dot_general(
            g_f, w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [SP, F]
        g_p1 = (g_ge * _gelu_grad(p1)).astype(x.dtype)
        g_m = jax.lax.dot_general(
            g_p1, w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [SP, Dm] f32

        # ---- LN2 backward (frozen) + residual into d h --------------------
        g_h = g_o + _ln_bwd_f32(g_m, xhat2, rstd2, gamma2)

        # ---- attention backward (attn_block bwd math, LN1 fused) ----------
        g_att = g_h.astype(x.dtype)  # d attn_out
        xln, xhat1, rstd1 = _ln_fwd_f32(x, gamma1, beta1, ln_eps1)
        xb = xln.astype(x.dtype)
        dctx = jax.lax.dot_general(
            g_att, wo_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        bqkv = bqkv_ref[...]
        q = (
            jax.lax.dot(xb, wq_ref[...], preferred_element_type=jnp.float32)
            + bqkv[0][None, :]
        ).astype(x.dtype)
        k = (
            jax.lax.dot(xb, wk_ref[...], preferred_element_type=jnp.float32)
            + bqkv[1][None, :]
        ).astype(x.dtype)
        v = (
            jax.lax.dot(xb, wv_ref[...], preferred_element_type=jnp.float32)
            + bqkv[2][None, :]
        ).astype(x.dtype)
        brow = brow_ref[i, 0].astype(jnp.float32)
        ctx = ctx_ref[i]
        for hh in range(num_heads):
            sl = slice(hh * d, (hh + 1) * d)
            qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
            doh = dctx[:, sl]
            oh = ctx[:, sl]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            s = s * scale + brow[None, :]
            p = jnp.exp(s - lse_ref[i, hh][:, None])
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
        nt = (((1,), (1,)), ((), ()))
        dxln = jax.lax.dot_general(dq_s[...], wq_ref[...], nt, preferred_element_type=jnp.float32)
        dxln = dxln + jax.lax.dot_general(dk_s[...], wk_ref[...], nt, preferred_element_type=jnp.float32)
        dxln = dxln + jax.lax.dot_general(dv_s[...], wv_ref[...], nt, preferred_element_type=jnp.float32)
        # through the (frozen) LN1, plus the two residual paths:
        # d x = LN1_bwd(d xln) + d h (residual h = x + attn(..)) — note g_h
        # already contains the o-residual path (g_o flowed into it above)
        dx = _ln_bwd_f32(dxln, xhat1, rstd1, gamma1) + g_h
        dx_ref[i] = dx.astype(dx_ref.dtype)


def _zeros_like_many(*ts):
    return tuple(jnp.zeros_like(t) for t in ts)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(22, 23, 24, 25, 26, 27, 28, 29, 30)
)
def layer_block(
    x, wq, wk, wv, wo, bqkv, bo, gb1, gb2, w1, b1, w2, b2,
    wda, bda, wua, bua, wdb, bdb, wub, bub, bias,
    num_heads: int, scale: Optional[float], ln_eps1: float, ln_eps2: float,
    w_a: float, w_b: float, use_b: bool,
    block_b: int = 1, interpret: bool = False,
):
    """Whole pre-LN layer with adapter site (see module docstring).

    Differentiable args: ``x`` and all weights; the backward returns REAL
    cotangents only for ``x`` and the active adapter (wda/bda/wua/bua) —
    everything else gets zeros (frozen-backbone contract).

    ``w_a``/``w_b``: forward scaling of the active adapter / frozen partner
    (single mode: ``w_a=1, use_b=False``; DAT ensemble: 0.5 x spec.scaling
    each).  ``bqkv`` [3, Dm] f32, ``bo`` [1, Dm] f32, ``gb1``/``gb2``
    [2, Dm] f32 LN params, ``b1`` [1, F] f32, ``b2`` [1, Dm] f32, adapter
    biases [1, Bt]/[1, Dm] f32.
    """
    out, _ = _layer_fwd_impl(
        x, wq, wk, wv, wo, bqkv, bo, gb1, gb2, w1, b1, w2, b2,
        wda, bda, wua, bua, wdb, bdb, wub, bub, bias,
        num_heads, scale, ln_eps1, ln_eps2, w_a, w_b, use_b, block_b, interpret,
    )
    return out


def _layer_fwd_impl(
    x, wq, wk, wv, wo, bqkv, bo, gb1, gb2, w1, b1, w2, b2,
    wda, bda, wua, bua, wdb, bdb, wub, bub, bias,
    num_heads, scale, ln_eps1, ln_eps2, w_a, w_b, use_b, block_b, interpret,
):
    """Plain-JAX forward: attention through the proven attn_block fwd kernel
    (keeping its ctx/lse residuals), the rest XLA ops replicating the
    composable path's math exactly (f32 LN internals, exact GELU, bf16
    matmul inputs)."""
    if scale is None:
        scale = (x.shape[-1] // num_heads) ** -0.5
    dt = x.dtype
    if x.shape[1] <= LN_FWD_FUSED_MAX_S:
        aout, (xp, brow, ctx, lse) = _fwd_call(
            x, wq, wk, wv, wo, bqkv, bo, gb1, bias, num_heads, scale,
            block_b, interpret, ln_eps1,
        )
    else:
        # large-S regime: LN1 in XLA, plain (non-LN) forward kernel; the
        # residual kept for the backward is the padded PRE-LN x (the bwd
        # kernel re-derives LN1 internally) — see LN_FWD_FUSED_MAX_S above.
        # Padded-row caveat: the forward kernel sees xln zero-PADDED (pad
        # added after LN), while the backward's in-kernel re-derivation
        # normalizes the zero-padded x, giving xln=beta on padded rows — the
        # recomputed q/k/v at padded positions differ from what produced the
        # saved ctx/lse.  This is benign ONLY because (a) `brow`'s key mask
        # is the FINITE NEG_INF (-1e9), so exp(s - lse) on padded keys stays
        # a well-defined ~0 rather than the NaN a true -inf would give, and
        # (b) padded-row cotangents are zero, cancelling every padded
        # contribution to dx and the adapter grads (dx is sliced back to
        # [:b, :s] regardless).  Keep NEG_INF finite next to this residual.
        xln, _, _ = _ln_fwd_f32(x, gb1[0][None, :], gb1[1][None, :], ln_eps1)
        aout, (_, brow, ctx, lse) = _fwd_call(
            xln.astype(dt), wq, wk, wv, wo, bqkv, bo, None, bias, num_heads,
            scale, block_b, interpret, None,
        )
        xp = _prep(x, bias, block_b)[0]
    h = x + aout
    m, _, _ = _ln_fwd_f32(h, gb2[0][None, :], gb2[1][None, :], ln_eps2)
    m = m.astype(dt)
    p1 = jnp.dot(m, w1, preferred_element_type=jnp.float32) + b1[0][None, :]
    f = jnp.dot(_gelu_exact(p1).astype(dt), w2, preferred_element_type=jnp.float32) + b2[0][None, :]
    o = h + f.astype(dt)

    def delta(wd, bd, wu, bu):
        down = jnp.dot(o, wd.astype(dt), preferred_element_type=jnp.float32) + bd[0][None, :]
        return jnp.dot(
            jnp.maximum(down, 0.0).astype(dt), wu.astype(dt),
            preferred_element_type=jnp.float32,
        ) + bu[0][None, :]

    d_total = w_a * delta(wda, bda, wua, bua)
    if use_b:
        d_total = d_total + w_b * delta(wdb, bdb, wub, bub)
    out = o + d_total.astype(dt)
    return out, (xp, brow, ctx, lse, aout)


def _layer_block_fwd(
    x, wq, wk, wv, wo, bqkv, bo, gb1, gb2, w1, b1, w2, b2,
    wda, bda, wua, bua, wdb, bdb, wub, bub, bias,
    num_heads, scale, ln_eps1, ln_eps2, w_a, w_b, use_b, block_b, interpret,
):
    out, (xp, brow, ctx, lse, aout) = _layer_fwd_impl(
        x, wq, wk, wv, wo, bqkv, bo, gb1, gb2, w1, b1, w2, b2,
        wda, bda, wua, bua, wdb, bdb, wub, bub, bias,
        num_heads, scale, ln_eps1, ln_eps2, w_a, w_b, use_b, block_b, interpret,
    )
    res = (
        xp, brow, ctx, lse, aout,
        wq, wk, wv, wo, bqkv, gb1, gb2, w1, b1, w2, b2,
        wda, bda, wua, bua, wdb, bdb, wub, bub,
        (bo, bias, x.shape),
    )
    return out, res


def _layer_block_bwd(
    num_heads, scale, ln_eps1, ln_eps2, w_a, w_b, use_b, block_b, interpret,
    res, g,
):
    (
        xp, brow, ctx, lse, aout,
        wq, wk, wv, wo, bqkv, gb1, gb2, w1, b1, w2, b2,
        wda, bda, wua, bua, wdb, bdb, wub, bub,
        (bo, bias, xshape),
    ) = res
    b, s, dm = xshape
    if scale is None:
        scale = (dm // num_heads) ** -0.5
    bp, sp, _ = xp.shape
    gp = g
    aoutp = aout
    if (sp != s) or (bp != b):
        gp = jnp.pad(g, ((0, bp - b), (0, sp - s), (0, 0)))
        aoutp = jnp.pad(aout, ((0, bp - b), (0, sp - s), (0, 0)))
    grid = (bp // block_b,)
    ft = w1.shape[1]
    bt = wda.shape[1]
    wspec = pl.BlockSpec((dm, dm), lambda i: (0, 0))

    def fixed(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))

    dx, dwda, dbda, dwua, dbua = pl.pallas_call(
        functools.partial(
            _layer_bwd_kernel, num_heads=num_heads, scale=scale,
            ln_eps1=ln_eps1, ln_eps2=ln_eps2, w_a=w_a, w_b=w_b, use_b=use_b,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),  # x
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),  # aout
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),  # ctx
            pl.BlockSpec((block_b, num_heads, sp), lambda i: (i, 0, 0)),  # lse
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),  # g
            pl.BlockSpec((block_b, 1, sp), lambda i: (i, 0, 0)),   # brow
            wspec, wspec, wspec, wspec,                            # wq..wo
            fixed((3, dm)),                                        # bqkv
            fixed((2, dm)), fixed((2, dm)),                        # gb1, gb2
            fixed((dm, ft)), fixed((1, ft)),                       # w1, b1
            fixed((ft, dm)), fixed((1, dm)),                       # w2, b2
            fixed((dm, bt)), fixed((1, bt)),                       # wda, bda
            fixed((bt, dm)), fixed((1, dm)),                       # wua, bua
            fixed((dm, bt)), fixed((1, bt)),                       # wdb, bdb
            fixed((bt, dm)), fixed((1, dm)),                       # wub, bub
        ],
        out_specs=(
            pl.BlockSpec((block_b, sp, dm), lambda i: (i, 0, 0)),  # dx
            fixed((dm, bt)), fixed((1, bt)),                       # dwda, dbda
            fixed((bt, dm)), fixed((1, dm)),                       # dwua, dbua
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, sp, dm), g.dtype),
            jax.ShapeDtypeStruct((dm, bt), jnp.float32),
            jax.ShapeDtypeStruct((1, bt), jnp.float32),
            jax.ShapeDtypeStruct((bt, dm), jnp.float32),
            jax.ShapeDtypeStruct((1, dm), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((sp, dm), g.dtype),
            pltpu.VMEM((sp, dm), g.dtype),
            pltpu.VMEM((sp, dm), g.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(
        xp, aoutp, ctx, lse, gp, brow,
        wq, wk, wv, wo, bqkv, gb1, gb2, w1, b1, w2, b2,
        wda, bda, wua, bua, wdb, bdb, wub, bub,
    )
    zeros_frozen = _zeros_like_many(wq, wk, wv, wo, bqkv, bo, gb1, gb2, w1, b1, w2, b2)
    zeros_b = _zeros_like_many(wdb, bdb, wub, bub)
    dbias = None if bias is None else jnp.zeros_like(bias)
    return (
        dx[:b, :s],
        *zeros_frozen,
        dwda.astype(wda.dtype), dbda[0].astype(bda.dtype)[None, :],
        dwua.astype(wua.dtype), dbua[0].astype(bua.dtype)[None, :],
        *zeros_b,
        dbias,
    )


layer_block.defvjp(_layer_block_fwd, _layer_block_bwd)
