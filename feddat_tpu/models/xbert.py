"""Fusion BERT ("xBERT") — ALBEF's multimodal text encoder / answer decoder.

Re-implements the behavior of the reference's vendored ``xbert.py``
(``src/modeling/models/xbert.py:170-1913``) as flax modules:

  * post-LN BERT layers; layers ``>= fusion_layer`` additionally
    cross-attend to image states (``xbert.py:456-459``; fusion_layer=6 via
    ``model_configs.py:58``); cross-attention K/V are sized by
    ``encoder_width`` (``xbert.py:235-240``);
  * encoder ``mode`` in {"text", "fusion", "multi_modal"} slices the layer
    range (``xbert.py:554-564``);
  * the DAT adapter slot lives in every FFN output with the pre/post
    LayerNorm sandwich (``xbert.py:429-445``, ``adapter.py:97-116``):
        r = dropout(dense(ffn));  z = LN(r + attn_out)
        a = r + adapter.delta(z); out = LN(a + attn_out)
  * ``XBertLMHead`` = 6-layer decoder (fusion_layer=0 -> cross everywhere)
    with causal self-attention + BERT prediction head; the shifted
    weighted-CE / soft-label distillation loss lives in
    :mod:`feddat_tpu.models.albef` (``xbert.py:1290-1302``).

TPU-first: the two homogeneous layer groups (text-only / fusion) are
``nn.scan``-stacked, so each group compiles once and its adapter params carry
a leading layer axis for structural partitioning.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from feddat_tpu.configs.core import AdapterSpec, AlbefBertConfig, LoraSpec
from feddat_tpu.models.adapters import AdapterCell
from feddat_tpu.models.layers import MultiHeadAttention
from feddat_tpu.ops.attention import causal_bias, mask_to_bias


class XBertEmbeddings(nn.Module):
    cfg: AlbefBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        c = self.cfg
        init = nn.initializers.normal(stddev=c.initializer_range)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = nn.Embed(c.vocab_size, c.hidden_size, embedding_init=init, dtype=self.dtype, name="word_embeddings")(input_ids)
        x = x + nn.Embed(
            c.max_position_embeddings, c.hidden_size, embedding_init=init, dtype=self.dtype, name="position_embeddings"
        )(jnp.arange(input_ids.shape[1])[None, :])
        x = x + nn.Embed(
            c.type_vocab_size, c.hidden_size, embedding_init=init, dtype=self.dtype, name="token_type_embeddings"
        )(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        return nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)


class XBertLayer(nn.Module):
    """One post-LN BERT layer with optional cross-attention and the adapter
    LN-sandwich at the FFN output."""

    cfg: AlbefBertConfig
    has_cross: bool
    adapter: AdapterSpec
    lora: LoraSpec = LoraSpec()
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    logits_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        self_bias,
        enc_states=None,
        enc_bias=None,
        adapter_mode: str = "none",
        deterministic: bool = True,
        cross_group: int = 1,
    ):
        c = self.cfg

        def residual_block(h, inner, name):
            out = nn.Dropout(c.hidden_dropout)(inner, deterministic=deterministic)
            return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name=name)(out + h)

        # self-attention (causal bias supplied by the decoder caller)
        attn = MultiHeadAttention(
            c.hidden_size,
            c.num_heads,
            dropout_rate=c.attention_dropout,
            lora=self.lora,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            logits_dtype=self.logits_dtype,
            name="attention",
        )(x, bias=self_bias, deterministic=deterministic)
        h = residual_block(x, attn, "attention_norm")

        if self.has_cross:
            # No LoRA here: the reference attaches LoRA only to
            # SELF-attention q/v (``albef.py:120-130`` replaces
            # ``attention.self.{query,value}``; crossattention untouched).
            mha = MultiHeadAttention(
                c.hidden_size,
                c.num_heads,
                dropout_rate=c.attention_dropout,
                lora=LoraSpec(),
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                logits_dtype=self.logits_dtype,
                name="crossattention",
            )
            if cross_group > 1:
                # Candidate-ranking layout (rank_answer): x is [B*k, La, D]
                # with all k candidate rows of one question attending the
                # SAME enc_states row.  Group them to [B, k*La, D] so the
                # encoder K/V projections run once per question instead of
                # once per candidate (k=64x fewer rows), with no repeated
                # enc_states in memory.  Identical math: every query token
                # still sees exactly its question's kv set.
                bk, la, dm = h.shape
                b = bk // cross_group
                hg = h.reshape(b, cross_group * la, dm)
                cross = mha(hg, kv=enc_states, bias=enc_bias, deterministic=deterministic)
                cross = cross.reshape(bk, la, dm)
            else:
                cross = mha(h, kv=enc_states, bias=enc_bias, deterministic=deterministic)
            h = residual_block(h, cross, "crossattention_norm")

        # FFN with adapter LN-sandwich
        from jax.ad_checkpoint import checkpoint_name

        init = nn.initializers.normal(stddev=c.initializer_range)
        inter = nn.Dense(c.intermediate_size, kernel_init=init, dtype=self.dtype, name="intermediate")(h)
        # same selective-remat tag as layers.Mlp: the [*, 4d] pre-GELU matmul
        # output is the most expensive tensor to recompute under remat
        inter = checkpoint_name(inter, "ffn_preact")
        inter = nn.gelu(inter, approximate=False)
        o = nn.Dense(c.hidden_size, kernel_init=init, dtype=self.dtype, name="output")(inter)
        o = nn.Dropout(c.hidden_dropout)(o, deterministic=deterministic)
        out_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="output_norm")
        if self.adapter.enabled:
            cell = AdapterCell(self.adapter, c.hidden_size, self.dtype, name="adapter")
            r = o
            z = out_norm(o + h)
            a = r + cell.delta(z, adapter_mode)
            return out_norm(a + h)
        return out_norm(o + h)


class XBertEncoder(nn.Module):
    """Layer stack with the fusion split: scan of text-only layers, then scan
    of cross-attending fusion layers (``mode`` slices which groups run)."""

    cfg: AlbefBertConfig
    adapter: AdapterSpec
    lora: LoraSpec = LoraSpec()
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    # Checkpoint policy for the layer remat ("full" = recompute everything,
    # the reference's torch.utils.checkpoint semantics; "names" saves the
    # tagged qkv/attn_probs/attn_out/ffn_preact tensors — on the fusion
    # layers that includes the S=577 image K/V projections, the dominant
    # recompute).  Resolved via ops/remat_policy.py like the ViT stacks.
    remat_policy: str = "full"
    logits_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        self_bias,
        enc_states=None,
        enc_bias=None,
        mode: str = "multi_modal",
        adapter_mode: str = "none",
        deterministic: bool = True,
        cross_group: int = 1,
    ):
        c = self.cfg
        n_text = c.fusion_layer
        n_fusion = c.num_layers - c.fusion_layer
        remat_policy = None
        if self.remat and self.remat_policy != "full":
            from feddat_tpu.ops.remat_policy import resolve_remat_policy

            remat_policy = resolve_remat_policy(
                self.remat_policy, supports_structural=False
            )

        def make_scan(has_cross, length, name):
            use_remat = self.remat
            layer_kwargs = dict(
                cfg=c,
                has_cross=has_cross,
                adapter=self.adapter,
                lora=self.lora,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                logits_dtype=self.logits_dtype,
            )

            class _Body(nn.Module):
                @nn.compact
                def __call__(self, carry, ctx):
                    layer = XBertLayer(**layer_kwargs, name="layer")

                    def call(mdl, h, c):
                        sb, eb, enc = c
                        return mdl(
                            h,
                            sb,
                            enc_states=enc if has_cross else None,
                            enc_bias=eb if has_cross else None,
                            adapter_mode=adapter_mode,
                            deterministic=deterministic,
                            cross_group=cross_group,
                        )

                    if use_remat:
                        # the gradient-checkpointing path the reference
                        # implements but never enables (``xbert.py:574-596``)
                        out = nn.remat(call, policy=remat_policy)(layer, carry, ctx)
                    else:
                        out = call(layer, carry, ctx)
                    return out, None

            return nn.scan(
                _Body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=length,
            )(name=name)

        ctx = (self_bias, enc_bias, enc_states)
        if mode in ("text", "multi_modal") and n_text > 0:
            x, _ = make_scan(False, n_text, "text_layers")(x, ctx)
        if mode in ("fusion", "multi_modal") and n_fusion > 0:
            x, _ = make_scan(True, n_fusion, "fusion_layers")(x, ctx)
        return x


class XBertModel(nn.Module):
    """Embeddings + encoder (reference ``BertModel`` without pooler —
    ALBEF loads it with ``add_pooling_layer=False``, ``albef_model.py:41``)."""

    cfg: AlbefBertConfig
    adapter: AdapterSpec = AdapterSpec()
    lora: LoraSpec = LoraSpec()
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    is_decoder: bool = False
    remat: bool = False
    remat_policy: str = "full"
    logits_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        token_type_ids=None,
        encoder_hidden_states=None,
        encoder_attention_mask=None,
        mode: str = "multi_modal",
        adapter_mode: str = "none",
        deterministic: bool = True,
        inputs_embeds=None,
        cross_group: int = 1,
        pack_group: int = 1,
    ):
        c = self.cfg
        if inputs_embeds is None:
            x = XBertEmbeddings(c, self.dtype, name="embeddings")(
                input_ids, token_type_ids, deterministic
            )
        else:
            x = inputs_embeds
        unpacked_shape = x.shape
        if pack_group > 1:
            # Pack ``pack_group`` independent sequences per row AFTER the
            # embeddings (position ids are per-sequence): the MXU-occupancy
            # lever for tiny decode sequences (rank_answer's [B*k, La=10]
            # rerank rows).  Self-attention sees a block-diagonal bias
            # (ops/attention.packed_self_bias — numerically EXACT vs the
            # unpacked layout); LN/FFN/adapters are row-independent; the
            # cross-attention grouping composes (the packed reshape is a
            # pure view of the same contiguous candidate order, so
            # cross_group just shrinks by the packing factor).
            N, L, D = x.shape
            if N % pack_group or cross_group % pack_group:
                raise ValueError(
                    f"pack_group={pack_group} must divide rows {N} and "
                    f"cross_group={cross_group}"
                )
            from feddat_tpu.ops.attention import packed_self_bias

            x = x.reshape(N // pack_group, pack_group * L, D)
            self_bias = packed_self_bias(
                attention_mask, pack_group, self.is_decoder, jnp.float32
            )
            cross_group = cross_group // pack_group
        else:
            self_bias = mask_to_bias(attention_mask, jnp.float32)
            if self.is_decoder:
                self_bias = self_bias + causal_bias(x.shape[1], jnp.float32)
        enc_bias = None
        if encoder_hidden_states is not None:
            if encoder_attention_mask is None:
                encoder_attention_mask = jnp.ones(
                    encoder_hidden_states.shape[:2], dtype=jnp.int32
                )
            enc_bias = mask_to_bias(encoder_attention_mask, jnp.float32)
        out = XBertEncoder(
            c,
            self.adapter,
            self.lora,
            self.dtype,
            self.attn_impl,
            remat=self.remat,
            remat_policy=self.remat_policy,
            logits_dtype=self.logits_dtype,
            name="encoder",
        )(
            x,
            self_bias,
            enc_states=encoder_hidden_states,
            enc_bias=enc_bias,
            mode=mode,
            adapter_mode=adapter_mode,
            deterministic=deterministic,
            cross_group=cross_group,
        )
        if pack_group > 1:
            out = out.reshape(unpacked_shape)
        return out


class _TiedDecoderBias(nn.Module):
    """Bias of the tied vocab projection (param path ``.../decoder/bias``,
    matching the untied layout so converters/partitioning are unchanged)."""

    vocab_size: int

    @nn.compact
    def __call__(self):
        return self.param("bias", nn.initializers.zeros, (self.vocab_size,), jnp.float32)


class BertPredictionHead(nn.Module):
    """transform(dense+gelu+LN) + TIED vocab projection (reference
    ``BertOnlyMLMHead``).  The projection kernel is the word-embedding
    matrix: ``BertLMHeadModel``/``BertForMaskedLM`` call ``init_weights()``
    which ties ``cls.predictions.decoder.weight`` to
    ``bert.embeddings.word_embeddings.weight`` (``xbert.py:1197-1202``,
    HF ``tie_word_embeddings`` default).  Consequence for PEFT parity:
    torch dedups the shared tensor under the *embeddings* name, so the
    reference's ``'.cls.' -> trainable`` routing (``main.py:248-250``)
    trains only the transform + decoder bias — the 23.4M-param vocab kernel
    stays frozen with the embeddings.  Tying (instead of declaring a second
    kernel labeled ROLE_HEAD) reproduces exactly that."""

    cfg: AlbefBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, tied_embedding):
        c = self.cfg
        init = nn.initializers.normal(stddev=c.initializer_range)
        h = nn.Dense(c.hidden_size, kernel_init=init, dtype=self.dtype, name="transform_dense")(hidden)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="transform_norm")(h)
        bias = _TiedDecoderBias(c.vocab_size, name="decoder")()
        return h @ tied_embedding.astype(self.dtype).T + bias.astype(self.dtype)


class XBertLMHead(nn.Module):
    """The 6-layer answer decoder (``BertLMHeadModel`` with fusion_layer=0,
    num_hidden_layers=6 — ``albef_model.py:31-33``): causal self-attention,
    cross-attention to question states in every layer, prediction head.

    Returns token logits [B, L, vocab]; sequence losses are computed by the
    caller (``feddat_tpu.models.albef``)."""

    cfg: AlbefBertConfig  # already respecialized: fusion_layer=0, num_layers=6
    adapter: AdapterSpec = AdapterSpec()
    lora: LoraSpec = LoraSpec()
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    remat_policy: str = "full"
    logits_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.bert = XBertModel(
            self.cfg,
            self.adapter,
            self.lora,
            self.dtype,
            self.attn_impl,
            is_decoder=True,
            remat=self.remat,
            remat_policy=self.remat_policy,
            logits_dtype=self.logits_dtype,
        )
        self.cls = BertPredictionHead(self.cfg, self.dtype)

    def bert_hidden(
        self,
        input_ids,
        attention_mask,
        encoder_hidden_states,
        encoder_attention_mask=None,
        adapter_mode: str = "none",
        deterministic: bool = True,
        cross_group: int = 1,
        pack_group: int = 1,
    ):
        """Decoder transformer only -> final hidden states (no LM head)."""
        return self.bert(
            input_ids,
            attention_mask,
            encoder_hidden_states=encoder_hidden_states,
            encoder_attention_mask=encoder_attention_mask,
            mode="multi_modal",
            adapter_mode=adapter_mode,
            deterministic=deterministic,
            cross_group=cross_group,
            pack_group=pack_group,
        )

    def cls_logits(self, hidden):
        """LM prediction head only (vocab projection tied to the decoder's
        own word embeddings, see :class:`BertPredictionHead`)."""
        tied = self.bert.variables["params"]["embeddings"]["word_embeddings"]["embedding"]
        return self.cls(hidden, tied)

    def __call__(
        self,
        input_ids,
        attention_mask,
        encoder_hidden_states,
        encoder_attention_mask=None,
        adapter_mode: str = "none",
        deterministic: bool = True,
        cross_group: int = 1,
        pack_group: int = 1,
    ):
        hidden = self.bert_hidden(
            input_ids,
            attention_mask,
            encoder_hidden_states,
            encoder_attention_mask,
            adapter_mode,
            deterministic,
            cross_group,
            pack_group,
        )
        return self.cls_logits(hidden)


class XBertMaskedLM(nn.Module):
    """Masked-LM head over the (optionally multimodal) encoder — the
    behavior of the reference's ``BertForMaskedLM`` with the soft-label
    distillation mix (``xbert.py:1360-1428``): per-token CE on masked
    positions (labels -100 = ignore), optionally blended with
    ``(1-alpha)*CE + alpha*soft`` like the LM decoder."""

    cfg: AlbefBertConfig
    adapter: AdapterSpec = AdapterSpec()
    lora: LoraSpec = LoraSpec()
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask,
        labels=None,
        encoder_hidden_states=None,
        encoder_attention_mask=None,
        soft_labels=None,
        alpha: float = 0.0,
        mode: str = "multi_modal",
        adapter_mode: str = "none",
        deterministic: bool = True,
        cross_group: int = 1,
    ):
        bert = XBertModel(
            self.cfg, self.adapter, self.lora, self.dtype, self.attn_impl, name="bert"
        )
        hidden = bert(
            input_ids,
            attention_mask,
            encoder_hidden_states=encoder_hidden_states,
            encoder_attention_mask=encoder_attention_mask,
            mode=mode,
            adapter_mode=adapter_mode,
            deterministic=deterministic,
            cross_group=cross_group,
        )
        tied = bert.variables["params"]["embeddings"]["word_embeddings"]["embedding"]
        logits = BertPredictionHead(self.cfg, self.dtype, name="cls")(hidden, tied)
        if labels is None:
            return logits
        import jax

        logits32 = logits.astype(jnp.float32)
        valid = labels != -100
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits32, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        loss = jnp.sum(nll) / jnp.maximum(1, jnp.sum(valid))
        if soft_labels is not None:
            distill = -jnp.sum(logp * soft_labels, axis=-1)
            distill = jnp.sum(jnp.where(valid, distill, 0.0)) / jnp.maximum(1, jnp.sum(valid))
            loss = (1.0 - alpha) * loss + alpha * distill
        return loss, logits
