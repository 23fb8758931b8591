"""Shared flax building blocks: attention projections, MLP, pre-LN layers.

These replace the reference's cuDNN-backed torch modules (HF ViLT internals,
``src/modeling/models/vit.py:12-110``) with TPU-idiomatic flax modules whose
attention core routes through :mod:`feddat_tpu.ops.attention`.

Naming notes for checkpoint converters and PEFT path rules:
  * LayerNorm modules contain ``norm`` in their names (PEFT mode ``norm``
    matches on it, mirroring reference ``main.py:176-182``);
  * LoRA params are ``lora_a`` / ``lora_b`` (mode ``lora`` matches ``lora``,
    reference ``main.py:184-188``);
  * adapter params are ``adapter*_down`` / ``adapter*_up`` under an
    ``adapter`` collection path (modes ``adapter``/``dat``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from feddat_tpu.configs.core import AdapterSpec, LoraSpec
from feddat_tpu.models.adapters import (
    MODE_ENSEMBLE,
    AdapterCell,
    _DenseParams,
    ensemble_members,
)
from feddat_tpu.ops.attention import dot_product_attention

# torch's default ``kaiming_uniform_(a=sqrt(5))`` (used by loralib for
# lora_A and by nn.Linear for weights): U(+-1/sqrt(fan_in)).
_kaiming_a5 = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class LoraDense(nn.Module):
    """Dense layer with an optional additive low-rank path.

    Matches loralib's ``lora.Linear(d, d, r=16)`` used by the reference on
    attention query/value projections (``src/modeling/adaptered_output.py:32-33``):
    ``y = Wx + b + (alpha/r) * B(Ax)``; A is init like loralib's lora_A
    (``kaiming_uniform_(a=sqrt(5))`` = U(+-1/sqrt(d))), B zeros, so the LoRA
    path starts as identity-zero.  The reference passes no ``lora_alpha``,
    so loralib's default 1 applies -> scaling 1/16 (see ``LoraSpec.alpha``).
    """

    features: int
    lora: LoraSpec
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(stddev=0.02)
    name_suffix: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(
            self.features,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            name="dense",
        )(x)
        if self.lora.enabled:
            a = nn.Dense(
                self.lora.rank,
                use_bias=False,
                kernel_init=_kaiming_a5,
                dtype=self.dtype,
                name="lora_a",
            )
            b = nn.Dense(
                self.features,
                use_bias=False,
                kernel_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="lora_b",
            )
            y = y + b(a(x)) * (self.lora.alpha / self.lora.rank)
        return y


class _LayerNormParams(nn.Module):
    """Param-declaration twin of ``nn.LayerNorm`` (scale + bias, same
    names/shapes/inits) for the fused-LN attention-block kernel."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        return scale, bias


class _LoraDenseParams(nn.Module):
    """Param-declaration twin of :class:`LoraDense` (dense + lora_a/lora_b)."""

    features: int
    lora: LoraSpec
    kernel_init: nn.initializers.Initializer = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, in_features: int):
        kernel, bias = _DenseParams(self.features, True, self.kernel_init, name="dense")(in_features)
        la = lb = None
        if self.lora.enabled:
            la, _ = _DenseParams(
                self.lora.rank, False, _kaiming_a5, name="lora_a"
            )(in_features)
            lb, _ = _DenseParams(
                self.features, False, nn.initializers.zeros, name="lora_b"
            )(self.lora.rank)
        return kernel, bias, la, lb


class _AttentionParams(nn.Module):
    """Param-declaration twin of MultiHeadAttention's projection set (same
    child names/shapes/inits) for the whole-layer kernel path."""

    hidden_size: int
    lora: LoraSpec

    @nn.compact
    def __call__(self, in_features: int):
        init = nn.initializers.normal(stddev=0.02)
        wq, bq, _, _ = _LoraDenseParams(self.hidden_size, self.lora, init, name="query")(in_features)
        wk, bk = _DenseParams(self.hidden_size, True, init, name="key")(in_features)
        wv, bv, _, _ = _LoraDenseParams(self.hidden_size, self.lora, init, name="value")(in_features)
        wo, bo = _DenseParams(self.hidden_size, True, init, name="out")(self.hidden_size)
        bqkv = jnp.stack([bq, bk, bv]).astype(jnp.float32)
        return wq, wk, wv, wo, bqkv, bo


class _MlpParams(nn.Module):
    """Param-declaration twin of :class:`Mlp` (intermediate + output Dense)."""

    intermediate_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, in_features: int):
        init = nn.initializers.normal(stddev=0.02)
        w1, b1 = _DenseParams(self.intermediate_size, True, init, name="intermediate")(in_features)
        w2, b2 = _DenseParams(self.hidden_size, True, init, name="output")(self.intermediate_size)
        return w1, b1, w2, b2


class _AdapterParams(nn.Module):
    """Param-declaration twin of :class:`AdapterCell` (every named adapter's
    down/up Dense pairs, identical paths under the parent's 'adapter' scope)."""

    spec: AdapterSpec
    model_dim: int

    @nn.compact
    def __call__(self):
        bottleneck = self.model_dim // self.spec.reduction_factor
        out = {}
        for name in self.spec.names:
            wd, bd = _DenseParams(bottleneck, name=f"{name}_down")(self.model_dim)
            wu, bu = _DenseParams(self.model_dim, name=f"{name}_up")(bottleneck)
            out[name] = (wd, bd, wu, bu)
        return out


def _attn_block_eligible(attn_impl, bias, lora, dropout_rate, deterministic):
    """Single source of truth for the attention-block-kernel eligibility:
    self-attention with a padding-row bias (or none), no LoRA, no live
    attention dropout.  Used by MultiHeadAttention (to route) and
    PreLNLayer (to decide LN fusion) — keep them in lockstep."""
    return (
        attn_impl == "block"
        and (bias is None or (bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1))
        and not lora.enabled
        and not (dropout_rate > 0.0 and not deterministic)
    )


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention with separate q/k/v/out projections.

    Cross-attention keys/values come from ``kv`` (``encoder_width``-sized in
    xBERT, reference ``xbert.py:235-240``).  LoRA attaches to query/value
    only, matching the reference.
    """

    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0
    lora: LoraSpec = LoraSpec()
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # storage dtype of the attention logits (fp32 = reference parity;
    # bf16 = +14% DAT throughput, see ops/attention.py)
    logits_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        ln: Optional[tuple] = None,
    ) -> jnp.ndarray:
        is_self = kv is None
        if kv is None:
            kv = x
        d_head = self.hidden_size // self.num_heads
        init = nn.initializers.normal(stddev=0.02)

        # Whole-attention-block Pallas kernel (frozen projections; see
        # ops/attn_block.py).  Causal/cross-attention sites (ALBEF decoder,
        # xBERT fusion) fall back to the composable path below.
        # Note on logits precision: the kernel computes QK^T with fp32
        # accumulation and softmaxes in fp32 regardless of self.logits_dtype
        # — i.e. it implements the logits_dtype=fp32 semantics exactly (the
        # logits are never stored at lower precision; they are never stored
        # at all — the backward recomputes them, again in fp32).  A bf16
        # logits_dtype setting merely has no storage to save here.
        use_block = is_self and _attn_block_eligible(
            self.attn_impl, bias, self.lora, self.dropout_rate, deterministic
        )
        if use_block:
            import jax as _jax

            from feddat_tpu.ops.attn_block import attn_block

            in_f = x.shape[-1]
            wq, bq, _, _ = _LoraDenseParams(self.hidden_size, self.lora, init, name="query")(in_f)
            wk, bk = _DenseParams(self.hidden_size, True, init, name="key")(in_f)
            wv, bv, _, _ = _LoraDenseParams(self.hidden_size, self.lora, init, name="value")(in_f)
            wo, bo = _DenseParams(self.hidden_size, True, init, name="out")(self.hidden_size)
            bqkv = jnp.stack([bq, bk, bv]).astype(jnp.float32)
            # optional fused pre-LN (PreLNLayer hands (scale, bias, eps) and
            # a PRE-norm x when its fuse_ln flag is on)
            gb = None
            ln_eps = None
            if ln is not None:
                gb = jnp.stack([ln[0], ln[1]]).astype(jnp.float32)
                ln_eps = float(ln[2])
            # 2 batch elements per grid step amortize the weight DMA at short
            # S (471 vs 469 samples/s on ViLT, PERF.md; verified to compile
            # through S=281, the CLI's (384, 640) canvas); at long S (ALBEF's
            # ViT, S=577) the doubled VMEM working set stalls the Mosaic
            # compiler — drop to 1.
            block_b = 2 if x.shape[1] <= 288 else 1
            import os as _os

            if _os.environ.get("FEDDAT_BLOCK_B"):  # perf-sweep override
                block_b = int(_os.environ["FEDDAT_BLOCK_B"])
            out = attn_block(
                x.astype(self.dtype),
                wq.astype(self.dtype), wk.astype(self.dtype), wv.astype(self.dtype),
                wo.astype(self.dtype),
                bqkv, bo.astype(jnp.float32)[None, :], gb, bias,
                self.num_heads, d_head ** -0.5, block_b,
                _jax.default_backend() == "cpu", ln_eps,
            )
            from jax.ad_checkpoint import checkpoint_name

            return checkpoint_name(out, "attn_out")
        if ln is not None:
            raise AssertionError(
                "fused-LN attention requested at a site that does not qualify "
                "for the block kernel (PreLNLayer must pre-check eligibility)"
            )

        q = LoraDense(self.hidden_size, self.lora, self.dtype, init, name="query")(x)
        k = nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype, name="key")(kv)
        v = LoraDense(self.hidden_size, self.lora, self.dtype, init, name="value")(kv)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.num_heads, d_head).transpose(0, 2, 1, 3)

        from jax.ad_checkpoint import checkpoint_name

        # selective-remat tags (see PreLNLayer): q/k/v are matmul outputs the
        # backward needs (attention dgrads) — storing them beats recompute
        q, k, v = (checkpoint_name(t, "qkv") for t in (q, k, v))
        dropout_rng = None
        if not deterministic and self.dropout_rate > 0.0:
            dropout_rng = self.make_rng("dropout")
        ctx = dot_product_attention(
            split(q),
            split(k),
            split(v),
            bias,
            dropout_rate=0.0 if deterministic else self.dropout_rate,
            dropout_rng=dropout_rng,
            impl=self.attn_impl,
            logits_dtype=self.logits_dtype,
        )
        b, h, s, d = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        out = nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype, name="out")(ctx)
        return checkpoint_name(out, "attn_out")


class Mlp(nn.Module):
    """Transformer FFN up to (but excluding) the output residual/adapter:
    ``dense1 -> gelu -> dense2`` (+ dropout), exact (erf) GELU like torch."""

    intermediate_size: int
    hidden_size: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from jax.ad_checkpoint import checkpoint_name

        init = nn.initializers.normal(stddev=0.02)
        h = nn.Dense(self.intermediate_size, kernel_init=init, dtype=self.dtype, name="intermediate")(x)
        # pre-GELU activation: the single most expensive tensor to recompute
        # (the [*, 4d] matmul) and what GELU's backward needs — prime
        # selective-remat save target
        h = checkpoint_name(h, "ffn_preact")
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, kernel_init=init, dtype=self.dtype, name="output")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h


class PreLNLayer(nn.Module):
    """Pre-LayerNorm transformer layer with the DAT adapter slot.

    Used by both ViLT (HF ``ViltLayer``) and ALBEF's ViT
    (``src/modeling/models/vit.py:80-110``) — identical math:

        h  = x + attn(norm_before(x))
        f  = mlp(norm_after(h))            # dense1-gelu-dense2(+dropout)
        o  = h + f
        out = o + adapter.delta(o)         # ViLT-style site (adapter(x, x))

    (reference adapter site: ``src/modeling/adaptered_output.py:67-79`` for
    ViLT, ``vit.py:99-110`` for the ViT blocks).
    """

    hidden_size: int
    num_heads: int
    intermediate_size: int
    adapter: AdapterSpec
    dropout_rate: float = 0.0
    attention_dropout: float = 0.0
    layer_norm_eps: float = 1e-12
    lora: LoraSpec = LoraSpec()
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    logits_dtype: jnp.dtype = jnp.float32
    # Recompute ONLY the attention block (projections + softmax(QK^T)V) in
    # the backward instead of the whole layer.  With a frozen backbone (the
    # PEFT regime) the [B,H,S,S] probabilities are the dominant saved
    # activation; dropping just them costs a fraction of full-layer remat's
    # recompute (one fwd-equivalent per backward) while fitting large
    # batches in HBM.
    remat_attention: bool = False
    # Recompute the LayerNorms in the backward (their fp32 internals are
    # what blows up no-remat memory; recompute is a cheap VPU pass).  Part
    # of the "minimal-save" policy: no layer remat + Pallas attention (no
    # stored probs) + checkpointed LNs.
    remat_ln: bool = False
    # With attn_impl='block': compute norm_before INSIDE the kernel too
    # (frozen scale/bias backward — create_model excludes the 'norm' PEFT
    # mode; opt-in, see ViltModelConfig.fuse_ln).
    fuse_ln: bool = False

    def _layer_kernel_eligible(
        self, bias, adapter_mode, deterministic, adapter_weights, x
    ) -> bool:
        """Whole-layer kernel gate: everything the attention-block kernel
        requires, plus an enabled adapter in a mode whose gradient contract
        the kernel implements (a single named adapter, or the fixed-weight
        ensemble whose second member is the frozen ``adapter_2`` teacher),
        no live hidden dropout, no per-example adapter weights, and an S
        cap of 592 = the largest padded length measured to compile and win
        on v5e (ALBEF's ViT at S=577: 116.4 vs 98.6 samples/s on the fused
        DAT step, PERF.md round 4; ``FEDDAT_LAYER_MAX_S`` overrides for
        perf sweeps)."""
        import os

        mode_ok = adapter_mode in self.adapter.names or (
            adapter_mode == MODE_ENSEMBLE
            and ensemble_members(self.adapter.names)[1] == "adapter_2"
        )
        return (
            self.adapter.enabled
            and mode_ok
            and adapter_weights is None
            and _attn_block_eligible(
                "block", bias, self.lora, self.attention_dropout, deterministic
            )
            and not (self.dropout_rate > 0.0 and not deterministic)
            and x.shape[1] <= int(os.environ.get("FEDDAT_LAYER_MAX_S", "592"))
        )

    def _layer_kernel(self, x, bias, adapter_mode):
        """Route the whole layer through ops/layer_block.py (params declared
        via the twin modules so the tree is byte-identical to the composable
        path's)."""
        import os

        import jax as _jax

        from feddat_tpu.ops.layer_block import layer_block

        in_f = x.shape[-1]
        wq, wk, wv, wo, bqkv, bo = _AttentionParams(
            self.hidden_size, self.lora, name="attention"
        )(in_f)
        ln1 = _LayerNormParams(name="norm_before")(self.hidden_size)
        ln2 = _LayerNormParams(name="norm_after")(self.hidden_size)
        w1, b1, w2, b2 = _MlpParams(
            self.intermediate_size, self.hidden_size, name="mlp"
        )(self.hidden_size)
        quads = _AdapterParams(self.adapter, self.hidden_size, name="adapter")()
        if adapter_mode == MODE_ENSEMBLE:
            a_name, b_name = ensemble_members(self.adapter.names)
            ew = self.adapter.ensemble_weight
            w_a = ew * self.adapter.scaling
            w_b = (1.0 - ew) * self.adapter.scaling
            use_b = True
        else:
            a_name = b_name = adapter_mode
            w_a, w_b, use_b = 1.0, 0.0, False
        wda, bda, wua, bua = quads[a_name]
        wdb, bdb, wub, bub = quads[b_name]

        def cast(t):
            return t.astype(self.dtype)

        gb1 = jnp.stack(ln1).astype(jnp.float32)
        gb2 = jnp.stack(ln2).astype(jnp.float32)
        # block_b is shared by the forward attn_block call and the backward
        # grid; the backward's VMEM working set (f32 [SP, F] FFN recompute +
        # per-head attention bwd) is much larger than the forward's, so
        # default to 1 (attn-block's block_b=2 win was +0.4% — negligible).
        block_b = 1
        if os.environ.get("FEDDAT_LAYER_BLOCK_B"):  # perf-sweep override
            block_b = int(os.environ["FEDDAT_LAYER_BLOCK_B"])
        return layer_block(
            x.astype(self.dtype),
            cast(wq), cast(wk), cast(wv), cast(wo),
            bqkv, bo.astype(jnp.float32)[None, :], gb1, gb2,
            cast(w1), b1.astype(jnp.float32)[None, :],
            cast(w2), b2.astype(jnp.float32)[None, :],
            cast(wda), bda.astype(jnp.float32)[None, :],
            cast(wua), bua.astype(jnp.float32)[None, :],
            cast(wdb), bdb.astype(jnp.float32)[None, :],
            cast(wub), bub.astype(jnp.float32)[None, :],
            bias,
            self.num_heads, None, self.layer_norm_eps, self.layer_norm_eps,
            float(w_a), float(w_b), use_b, block_b,
            _jax.default_backend() == "cpu",
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        adapter_mode: str = "none",
        deterministic: bool = True,
        adapter_weights: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        # 'layer' = the WHOLE-layer Pallas backward kernel
        # (ops/layer_block.py): one fused vjp for LN1+attention+LN2+FFN+
        # adapter with frozen-backbone/real-adapter gradients; layers that
        # don't qualify fall back to the attention-block kernel path.
        impl = "block" if self.attn_impl == "layer" else self.attn_impl
        if self.attn_impl == "layer" and self._layer_kernel_eligible(
            bias, adapter_mode, deterministic, adapter_weights, x
        ):
            return self._layer_kernel(x, bias, adapter_mode)
        attn = MultiHeadAttention(
            self.hidden_size,
            self.num_heads,
            dropout_rate=self.attention_dropout,
            lora=self.lora,
            dtype=self.dtype,
            attn_impl=impl,
            logits_dtype=self.logits_dtype,
            name="attention",
        )
        # this is a self-attention site; when the kernel is eligible and
        # fuse_ln is on, norm_before runs inside it on the PRE-norm input
        block_ok = _attn_block_eligible(
            impl, bias, self.lora, self.attention_dropout, deterministic
        )
        # LN fusion cap (measured, PERF.md "fused-LN at S=577"): with
        # row-chunked LN temporaries + the hybrid XLA LN backward the TRAIN
        # program now compiles at S=592, but gains nothing (106.7 vs 106.8
        # samples/s) and the EVAL program's fwd kernel still overflows
        # scoped VMEM by 240 KB — so the fusion stays gated to the regime
        # where it measured +2% (ViLT, S<=281).
        if block_ok and self.fuse_ln and x.shape[1] <= 448:
            ln_scale, ln_bias = _LayerNormParams(name="norm_before")(self.hidden_size)
            attn_out = attn(
                x, bias=bias, deterministic=deterministic,
                ln=(ln_scale, ln_bias, self.layer_norm_eps),
            )
        else:
            ln_before = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm_before"
            )
            if self.remat_ln:
                attn_in = nn.remat(lambda mdl, h: mdl(h))(ln_before, x)
            else:
                attn_in = ln_before(x)
            if self.remat_attention:
                attn_out = nn.remat(
                    lambda mdl, h, b: mdl(h, bias=b, deterministic=deterministic)
                )(attn, attn_in, bias)
            else:
                attn_out = attn(attn_in, bias=bias, deterministic=deterministic)
        attn_out = nn.Dropout(self.dropout_rate)(attn_out, deterministic=deterministic)
        h = x + attn_out

        ln_after = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm_after")
        if self.remat_ln:
            mlp_in = nn.remat(lambda mdl, hh: mdl(hh))(ln_after, h)
        else:
            mlp_in = ln_after(h)
        f = Mlp(
            self.intermediate_size,
            self.hidden_size,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="mlp",
        )(mlp_in, deterministic=deterministic)
        o = h + f
        if self.adapter.enabled:
            cell = AdapterCell(self.adapter, self.hidden_size, self.dtype, name="adapter")
            o = o + cell.delta(o, adapter_mode, adapter_weights)
        return o
