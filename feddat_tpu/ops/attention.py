"""Attention core, behind a swappable-kernel interface.

The reference computes attention through cuDNN-backed ``nn.Linear`` + matmuls
(HF ViLT internals; ``src/modeling/models/vit.py:60-76``;
``src/modeling/models/xbert.py:235-330``).  Here the projections live in the
flax layers and the softmax(QK^T)V core is routed through this module so the
implementation can switch between a pure-XLA path (lets XLA fuse; best for
short multimodal sequences) and a Pallas flash-attention kernel
(``feddat_tpu.ops.flash``) for long sequences — without any model change.
SURVEY.md §5.7: keeping attention behind this interface is what lets
blockwise/long-context variants slot in later.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    scale: float,
    dropout_rate: float,
    dropout_rng,
    logits_dtype=jnp.float32,
) -> jnp.ndarray:
    """Reference XLA path.  q,k,v: [B, H, S, D] (q: S_q, k/v: S_kv).

    ``logits_dtype`` controls the STORAGE dtype of the [B,H,S,S] logits (and
    therefore of their cotangents in the backward): fp32 (default, exact
    parity with the reference's fp32 softmax) or bf16 (+14% measured DAT
    throughput on v5e from halved HBM traffic; the softmax itself still
    accumulates in fp32).  MXU accumulation is fp32 either way.
    """
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = (logits * scale).astype(logits_dtype)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(v.dtype)
    # tag for the selective-remat policy (remat_policy="names"): probs are
    # expensive to recompute (QK^T + softmax) but cheap to store in bf16
    from jax.ad_checkpoint import checkpoint_name

    probs = checkpoint_name(probs, "attn_probs")
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    impl: str = "auto",
    logits_dtype=jnp.float32,
) -> jnp.ndarray:
    """Multi-head attention core.

    Args:
      q: [B, H, S_q, D]
      k, v: [B, H, S_kv, D]
      bias: additive attention bias broadcastable to [B, H, S_q, S_kv]
        (use large negative values for masked positions).
      scale: defaults to D ** -0.5.
      impl: "auto" | "xla" | "flash".

    Returns: [B, H, S_q, D] in v.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl in ("auto", "xla", "block"):
        # Multimodal VQA sequences are short (<= ~620 tokens); the fused-XLA
        # path saturates the MXU there.  "flash" switches to the Pallas
        # kernel (long-sequence path).  "block" is handled at the layer
        # level (ops/attn_block.py fuses the projections too); reaching here
        # means a non-self-attention call site, which falls back to XLA.
        return _xla_attention(
            q, k, v, bias, scale=scale, dropout_rate=dropout_rate,
            dropout_rng=dropout_rng, logits_dtype=logits_dtype,
        )
    if impl == "flash":
        # The Pallas kernels have no prob-dropout; sites with LIVE attention
        # dropout (viltbert/ALBEF text towers train at rate 0.1) fall back
        # to XLA — the same per-site fallback policy 'block' uses, so one
        # --attn_impl flag works across every family (dropout_rate is
        # already 0.0 at eval, which keeps the kernel on the eval path).
        if dropout_rate > 0.0:
            return _xla_attention(
                q, k, v, bias, scale=scale, dropout_rate=dropout_rate,
                dropout_rng=dropout_rng, logits_dtype=logits_dtype,
            )
        from feddat_tpu.ops.flash import flash_attention

        interpret = jax.default_backend() == "cpu"
        return flash_attention(q, k, v, bias, scale, interpret)
    if impl == "fused":
        # Fast path covers the self-attention + [B,1,1,S]-padding-bias
        # shape only; cross-attention (ALBEF fusion/decoder), combined
        # causal+padding biases ([B,1,S,S]), broadcast-batch biases and
        # live dropout fall back to XLA per site (mirrors 'block').  The
        # whole-S kernel holds all-heads [H, S, S] fp32 logit tiles in VMEM
        # (the backward keeps ~4 alive): past the default 16 MiB scoped-VMEM
        # budget it does not compile (measured at ALBEF's S=577, PERF.md),
        # so oversize grids route to XLA instead of failing deep inside jit.
        H, S = q.shape[1], q.shape[2]
        vmem_est = 4 * H * S * S * 4  # bytes: ~4 live fp32 [H,S,S] tiles
        eligible = (
            dropout_rate == 0.0
            and k.shape[2] == q.shape[2]
            and vmem_est <= 16 * 1024 * 1024
            and (
                bias is None
                or (bias.shape[0] in (1, q.shape[0])  # kernel expands B=1
                    and bias.shape[1] == 1 and bias.shape[2] == 1)
            )
        )
        if not eligible:
            return _xla_attention(
                q, k, v, bias, scale=scale, dropout_rate=dropout_rate,
                dropout_rng=dropout_rng, logits_dtype=logits_dtype,
            )
        from feddat_tpu.ops.fused_attention import fused_short_attention

        interpret = jax.default_backend() == "cpu"
        return fused_short_attention(q, k, v, bias, scale, interpret)
    raise ValueError(f"unknown attention impl {impl!r}")


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, S] {0,1} padding mask -> additive [B, 1, 1, S] bias.

    Uses the same -10000.0 fill as BERT/ViLT's ``get_extended_attention_mask``
    so logits match the reference bit-for-bit in fp32.
    """
    bias = (1.0 - mask.astype(jnp.float32)) * -10000.0
    return bias[:, None, None, :].astype(dtype)


def causal_bias(seq_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask [1, 1, S, S] (for the ALBEF answer decoder)."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    allowed = j <= i
    bias = jnp.where(allowed, 0.0, -10000.0)
    return bias[None, None, :, :].astype(dtype)


def packed_self_bias(
    mask: jnp.ndarray, group: int, causal: bool, dtype=jnp.float32
) -> jnp.ndarray:
    """Self-attention bias for ``group`` independent length-L sequences
    PACKED per row: [N, L] padding mask (N = G*group) -> additive
    [G, 1, group*L, group*L] bias that is block-diagonal over the packed
    sequences (cross-sequence keys masked), carries each key's padding
    mask, and is causal within each sequence when ``causal``.

    Why: tiny decode sequences (ALBEF rank-answer rerank: B*k=1024 rows of
    La=10) leave the MXU ~8% row-occupied per attention dot; packing g
    candidates per row turns [La, La] dots into [g*La, g*La] at a g^2
    score-FLOP overhead that is negligible for La=10 (the scores are <1%
    of the layer's FLOPs).  Numerically EXACT vs the unpacked layout: the
    -10000.0 fill (reference ``get_extended_attention_mask`` constant)
    underflows ``exp`` to 0.0 in fp32, so cross-sequence keys contribute
    exactly zero to both the softmax normalizer and the context sum.
    """
    n, L = mask.shape
    g = group  # sequences per packed row
    G = n // g
    key = (1.0 - mask.astype(jnp.float32).reshape(G, g * L)) * -10000.0
    idx = jnp.arange(g * L)
    allowed = (idx[:, None] // L) == (idx[None, :] // L)
    if causal:
        allowed = allowed & ((idx[None, :] % L) <= (idx[:, None] % L))
    struct = jnp.where(allowed, 0.0, -10000.0)
    bias = key[:, None, None, :] + struct[None, None, :, :]
    return bias.astype(dtype)
