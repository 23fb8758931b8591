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
from feddat_tpu.models.adapters import AdapterCell
from feddat_tpu.ops.attention import dot_product_attention


class LoraDense(nn.Module):
    """Dense layer with an optional additive low-rank path.

    Matches loralib's ``lora.Linear(d, d, r=16)`` used by the reference on
    attention query/value projections (``src/modeling/adaptered_output.py:32-33``):
    ``y = Wx + b + (alpha/r) * B(Ax)``; A is init with he-uniform, B zeros, so
    the LoRA path starts as identity-zero.
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
                kernel_init=nn.initializers.he_uniform(),
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
    ) -> jnp.ndarray:
        if kv is None:
            kv = x
        d_head = self.hidden_size // self.num_heads
        init = nn.initializers.normal(stddev=0.02)

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

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        adapter_mode: str = "none",
        deterministic: bool = True,
        adapter_weights: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        attn = MultiHeadAttention(
            self.hidden_size,
            self.num_heads,
            dropout_rate=self.attention_dropout,
            lora=self.lora,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            logits_dtype=self.logits_dtype,
            name="attention",
        )
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
