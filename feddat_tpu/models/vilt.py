"""ViLT-B/32 vision-language encoder + continual-learner heads, flax-native.

Re-implements the behavior of the reference's HF-``ViltModel`` wrapper and
``ViltContinualLearner`` (``src/modeling/vilt.py:26-382``) as a pure flax
model with static shapes:

  * text embeddings = BERT-style word+pos+type, LN, dropout;
  * patch embeddings = 32x32 conv, CLS token, learned positions;
  * modality-type embeddings with vocab 3 (expanded 2->3 for NLVR2, reference
    ``vilt.py:102-113``);
  * 12 pre-LN layers with the DAT adapter slot at every layer output
    (reference injects ``Adaptered_ViltOutput`` into all 12 layers,
    ``vilt.py:356-361``), compiled once via ``nn.scan``;
  * final LayerNorm + tanh pooler on the CLS token;
  * per-task classification / multi-choice heads (reference
    ``vilt.py:187-219``).

TPU-first deviations from the reference:
  * tokenization/resizing happens in the host input pipeline, never inside
    ``__call__`` (reference does both inside the model, ``vilt.py:87-100``);
  * images are a fixed-size canvas -> no per-sample position-embedding
    interpolation or token selection (HF ``visual_embed``'s dynamic gather);
    padding is handled by the attention mask;
  * the 12 layers are ``nn.scan``-stacked: adapter/LoRA params carry a
    leading [12] axis, which makes FedAvg and partitioning single-slice ops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from feddat_tpu.configs.core import ViltModelConfig
from feddat_tpu.models.layers import PreLNLayer
from feddat_tpu.ops.attention import mask_to_bias


@dataclasses.dataclass(frozen=True)
class TaskHeadSpec:
    """What the reference reads from each task config to build a head
    (``vilt.py:187-219``)."""

    num_labels: int
    num_images: int = 1
    model_type: str = "classification"
    num_choices: int = 1


class ClassificationHead(nn.Module):
    """``Linear(d*num_images -> 2d) -> LayerNorm -> GELU -> Linear(-> num_labels)``
    (reference ``vilt.py:200-210``)."""

    encoder_dim: int
    num_labels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.normal(stddev=0.02)
        h = nn.Dense(self.encoder_dim * 2, kernel_init=init, dtype=self.dtype, name="clf_fc0")(pooled)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="clf_norm0")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.num_labels, kernel_init=init, dtype=self.dtype, name="clf_fc1")(h)


class MultiChoiceHead(nn.Module):
    """``Dropout(0.1) -> Linear(d -> 1)`` (reference ``vilt.py:212-219``)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dropout(0.1)(pooled, deterministic=deterministic)
        return nn.Dense(1, kernel_init=nn.initializers.normal(stddev=0.02), dtype=self.dtype, name="clf_fc0")(h)


class ViltTextEmbeddings(nn.Module):
    """BERT-style text embeddings (HF ``TextEmbeddings``)."""

    config: ViltModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic=True, inputs_embeds=None):
        c = self.config
        init = nn.initializers.normal(stddev=c.initializer_range)
        if inputs_embeds is None:
            words = nn.Embed(c.vocab_size, c.hidden_size, embedding_init=init, dtype=self.dtype, name="word_embeddings")(input_ids)
        else:
            # ViLT-BERT path: text token states come from a frozen BERT
            # (reference ``viltbert.py:115-138``); position/type embeddings
            # and LN still apply, matching HF's ``inputs_embeds`` branch.
            words = inputs_embeds.astype(self.dtype)
        seq_len = input_ids.shape[1]
        positions = nn.Embed(c.max_text_len, c.hidden_size, embedding_init=init, dtype=self.dtype, name="position_embeddings")(
            jnp.arange(seq_len)[None, :]
        )
        types = nn.Embed(c.type_vocab_size, c.hidden_size, embedding_init=init, dtype=self.dtype, name="token_type_embeddings")(
            token_type_ids
        )
        x = words + positions + types
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        return nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)


class ViltVisualEmbeddings(nn.Module):
    """Patch conv + CLS + learned positions (HF ``ViltEmbeddings.visual_embed``
    specialized to a fixed-size canvas: no dynamic token selection)."""

    config: ViltModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        c = self.config
        b = pixel_values.shape[0]
        init = nn.initializers.normal(stddev=c.initializer_range)
        # NHWC conv; converters transpose torch's NCHW weights.
        patches = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            kernel_init=init,
            dtype=self.dtype,
            name="patch_projection",
        )(pixel_values)
        patches = patches.reshape(b, -1, c.hidden_size)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, c.hidden_size))
        pos = self.param(
            "position_embeddings", nn.initializers.zeros, (1, c.num_patches + 1, c.hidden_size)
        )
        # Canvas-bucketed inputs (pipeline ``--canvas_bucket``): a pixel
        # canvas SMALLER than the configured one uses the top-left subgrid
        # of the learned position grid — numerically identical to running
        # the full canvas with the extra columns mask-padded (the narrow
        # canvas IS that top-left rectangle), so bucketed and full-canvas
        # scores agree exactly (tests/test_canvas_bucket.py).
        gh = pixel_values.shape[1] // c.patch_size
        gw = pixel_values.shape[2] // c.patch_size
        ph = c.image_size[0] // c.patch_size
        pw = c.image_size[1] // c.patch_size
        if (gh, gw) != (ph, pw):
            grid = pos[:, 1:].reshape(1, ph, pw, c.hidden_size)[:, :gh, :gw]
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, gh * gw, c.hidden_size)], axis=1
            )
        x = jnp.concatenate([jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, c.hidden_size)), patches], axis=1)
        x = x + pos.astype(self.dtype)
        return nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)


class ViltEncoder(nn.Module):
    """The full two-stream-concat ViLT transformer.

    Returns ``(sequence_output, pooled_output)``; pooled = tanh(dense(CLS)).
    """

    config: ViltModelConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        token_type_ids: Optional[jnp.ndarray] = None,
        pixel_values: jnp.ndarray = None,
        pixel_mask: Optional[jnp.ndarray] = None,
        image_token_type_idx: int = 1,
        adapter_mode: str = "none",
        deterministic: bool = True,
        inputs_embeds: Optional[jnp.ndarray] = None,
        adapter_weights: Optional[jnp.ndarray] = None,
    ):
        c = self.config
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        if pixel_mask is not None and pixel_mask.ndim == 2 and pixel_mask.shape[-1] == 2:
            # compact mask form: [B, 2] (valid_h, valid_w) dims — the mask is
            # always a top-left rectangle, so ship 16 bytes/image instead of
            # a [H, W] int32 plane (28 MB/batch at B=48) and rebuild it here
            import jax as _jax

            # follow the ACTUAL pixel canvas (canvas bucketing feeds shapes
            # smaller than the configured one)
            H, W = pixel_values.shape[1], pixel_values.shape[2]
            hh = pixel_mask[:, 0][:, None, None]
            ww = pixel_mask[:, 1][:, None, None]
            ih = _jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
            iw = _jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
            pixel_mask = ((ih < hh) & (iw < ww)).astype(jnp.int32)

        if pixel_values is not None and pixel_values.dtype == jnp.uint8:
            # RAW-uint8 pixel path (pipeline ``pixels_u8`` / CLI
            # ``--device_normalize``): 4x less host->device traffic; the
            # normalize runs on-chip in f32 (identical math to the host
            # path) and the canvas zero-pad is reproduced exactly by
            # masking — padded u8 zeros would otherwise normalize to -1.
            from feddat_tpu.data.images import VILT_MEAN, VILT_STD

            x = pixel_values.astype(jnp.float32) / 255.0
            x = (x - VILT_MEAN) / VILT_STD
            if pixel_mask is not None:
                x = x * pixel_mask[..., None].astype(x.dtype)
            pixel_values = x

        text = ViltTextEmbeddings(c, self.dtype, name="text_embeddings")(
            input_ids, token_type_ids, deterministic, inputs_embeds
        )
        image = ViltVisualEmbeddings(c, self.dtype, name="visual_embeddings")(
            pixel_values, deterministic
        )

        image_mask_base = None
        if pixel_mask is None:
            image_mask_base = jnp.ones((image.shape[0], image.shape[1]), dtype=attention_mask.dtype)
        else:
            # Patch-level mask from a pixel-level mask (per-canvas): a patch
            # is valid iff any covered pixel is valid; CLS always valid.
            ph = pixel_mask.shape[1] // c.patch_size
            pw = pixel_mask.shape[2] // c.patch_size
            pm = pixel_mask.reshape(
                pixel_mask.shape[0], ph, c.patch_size, pw, c.patch_size
            ).max(axis=(2, 4))
            patch_mask = pm.reshape(pixel_mask.shape[0], -1).astype(attention_mask.dtype)
            cls_mask = jnp.ones((image.shape[0], 1), dtype=attention_mask.dtype)
            image_mask_base = jnp.concatenate([cls_mask, patch_mask], axis=1)

        if c.prompt.enabled:
            # Prompt tuning: splice reparameterized prompts after CLS in both
            # streams (reference ``prompted_output.py:243-262``).
            from feddat_tpu.models.prompts import ReparamPrompt, splice_after_cls

            text_prompt = ReparamPrompt(c.prompt, c.hidden_size, self.dtype, name="prompt_text")()
            vis_prompt = ReparamPrompt(c.prompt, c.hidden_size, self.dtype, name="prompt_vis")()
            text, attention_mask = splice_after_cls(text, attention_mask, text_prompt)
            image, image_mask_base = splice_after_cls(image, image_mask_base, vis_prompt)
            input_ids = jnp.zeros(
                (text.shape[0], text.shape[1]), dtype=input_ids.dtype
            )  # only its shape feeds the modality-type lookup below

        # Modality-type embeddings: 0 = text, 1 = image, 2 = second image.
        modality = nn.Embed(
            c.modality_type_vocab_size,
            c.hidden_size,
            embedding_init=nn.initializers.normal(stddev=c.initializer_range),
            dtype=self.dtype,
            name="modality_type_embeddings",
        )
        text = text + modality(jnp.zeros_like(input_ids))
        img_type = jnp.full((image.shape[0], image.shape[1]), image_token_type_idx, dtype=jnp.int32)
        image = image + modality(img_type)

        x = jnp.concatenate([text, image], axis=1)
        mask = jnp.concatenate([attention_mask, image_mask_base], axis=1)
        bias = mask_to_bias(mask, jnp.float32)

        layer_kwargs = dict(
            hidden_size=c.hidden_size,
            num_heads=c.num_heads,
            intermediate_size=c.intermediate_size,
            adapter=c.adapter,
            dropout_rate=c.hidden_dropout,
            attention_dropout=c.attention_dropout,
            layer_norm_eps=c.layer_norm_eps,
            lora=c.lora,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            logits_dtype=jnp.dtype(c.attention_logits_dtype),
            remat_attention=(c.remat and c.remat_policy == "attention"),
            remat_ln=(c.remat and c.remat_policy == "min_save"),
            fuse_ln=getattr(c, "fuse_ln", False),
        )

        class _LayerBody(nn.Module):
            """Scan body: carry = hidden states; bias/adapter weights
            broadcast to all layers."""

            @nn.compact
            def __call__(self, carry, layer_bias, layer_adapter_w):
                layer = PreLNLayer(**layer_kwargs, name="layer")
                # the whole-layer kernel's custom vjp saves exactly its own
                # minimal residual set — wrapping it in jax.checkpoint would
                # only discard those and re-run the forward; skip remat.
                # Eligibility is per-CALL (live dropout, weighted/per-example
                # adapter modes, S caps): when a 'layer'-configured model
                # falls back to the composable path at this trace, keep the
                # configured remat instead of silently running no-remat at
                # the kernel path's tuned batch sizes.
                layer_kernel_live = layer_kwargs[
                    "attn_impl"
                ] == "layer" and layer._layer_kernel_eligible(
                    layer_bias, adapter_mode, deterministic, layer_adapter_w, carry
                )
                if (
                    c.remat
                    and c.remat_policy not in ("attention", "min_save")
                    and not layer_kernel_live
                ):
                    from feddat_tpu.ops.remat_policy import resolve_remat_policy

                    policy = resolve_remat_policy(c.remat_policy)
                    out = nn.remat(
                        lambda mdl, h, b, w: mdl(h, b, adapter_mode, deterministic, w),
                        policy=policy,
                    )(layer, carry, layer_bias, layer_adapter_w)
                else:
                    out = layer(carry, layer_bias, adapter_mode, deterministic, layer_adapter_w)
                return out, None

        Layers = nn.scan(
            _LayerBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=c.num_layers,
            unroll=getattr(c, "scan_unroll", 1),
        )
        x, _ = Layers(name="layers")(x, bias, adapter_weights)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_norm")(x)
        pooled = nn.Dense(
            c.hidden_size,
            kernel_init=nn.initializers.normal(stddev=c.initializer_range),
            dtype=self.dtype,
            name="pooler",
        )(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled


def init_vilt_params(model: "ViltContinualLearner", rng, batch) -> Dict[str, Any]:
    """Jitted full-tree init (encoder + every head + every adapter)."""
    import jax

    return jax.jit(
        lambda r, b: model.init(r, b, method=type(model).init_all)
    )(rng, batch)["params"]


class ViltContinualLearner(nn.Module):
    """ViLT encoder + per-task heads; forward dispatch mirrors the reference
    (``vilt.py:221-353``): single-image / multi-image (NLVR2) / multi-choice
    (VCR)."""

    config: ViltModelConfig
    task_heads: Dict[str, TaskHeadSpec]
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        self.encoder = ViltEncoder(self.config, self.dtype, self.attn_impl, name="vilt")
        heads = {}
        for key, spec in self.task_heads.items():
            if spec.model_type == "classification":
                heads[key] = ClassificationHead(
                    self.config.hidden_size, spec.num_labels, self.dtype, name=f"task_{key}"
                )
            else:
                heads[key] = MultiChoiceHead(self.dtype, name=f"task_{key}")
        self._heads = heads

    def init_all(self, batch: Dict[str, Any], adapter_mode: str = "init_all"):
        """Initialization-only forward touching the encoder (all adapters via
        MODE_INIT) and EVERY task head, so the param tree is complete no
        matter which task is traced first.  Use as
        ``model.init(rng, batch, method=ViltContinualLearner.init_all)``."""
        def squash(x, rank):
            """Normalize multi-choice [B,C,L] / multi-image [B,N,H,W,C]
            inputs down to a single-stream slice for param creation."""
            if x is None:
                return None
            return x[:, 0] if x.ndim > rank else x

        _, pooled = self.encoder(
            input_ids=squash(batch["input_ids"], 2),
            attention_mask=squash(batch["attention_mask"], 2),
            token_type_ids=squash(batch.get("token_type_ids"), 2),
            pixel_values=squash(batch["pixel_values"], 4),
            pixel_mask=squash(batch.get("pixel_mask"), 3),
            adapter_mode=adapter_mode,
            deterministic=True,
        )
        out = 0.0
        for key, spec in self.task_heads.items():
            if spec.model_type == "multi-choice":
                logits = self._heads[key](pooled[:, None, :])
            else:
                tiled = jnp.concatenate([pooled] * spec.num_images, axis=-1)
                logits = self._heads[key](tiled)
            out = out + jnp.sum(logits)
        return out

    def __call__(
        self,
        task_key: str,
        batch: Dict[str, Any],
        adapter_mode: str = "none",
        deterministic: bool = True,
    ):
        spec = self.task_heads[task_key]
        if spec.model_type == "multi-choice":
            return self.forward_multi_choice(task_key, batch, adapter_mode, deterministic)
        if spec.num_images == 1:
            return self.forward_single_image(task_key, batch, adapter_mode, deterministic)
        return self.forward_multi_images(task_key, batch, adapter_mode, deterministic)

    def encode_single_image(self, task_key, batch, adapter_mode="none", deterministic=True):
        """Encoder-only forward -> pooled [B, d] (used by the fused DAT step,
        which shares one ensemble encoder pass between its ① and ③ stages;
        the joint step passes per-example ``adapter_weights`` with
        ``adapter_mode='weighted'``)."""
        _, pooled = self.encoder(
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            token_type_ids=batch.get("token_type_ids"),
            pixel_values=batch["pixel_values"],
            pixel_mask=batch.get("pixel_mask"),
            adapter_mode=adapter_mode,
            deterministic=deterministic,
            adapter_weights=batch.get("adapter_weights"),
        )
        return pooled

    def apply_head(self, task_key, pooled):
        """Head-only forward (classification heads)."""
        return self._heads[task_key](pooled)

    def forward_single_image(self, task_key, batch, adapter_mode="none", deterministic=True):
        """Reference ``vilt.py:244-264``: encode, then head on pooled output."""
        _, pooled = self.encoder(
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            token_type_ids=batch.get("token_type_ids"),
            pixel_values=batch["pixel_values"],
            pixel_mask=batch.get("pixel_mask"),
            adapter_mode=adapter_mode,
            deterministic=deterministic,
        )
        logits = self._heads[task_key](pooled)
        return pooled, logits

    def forward_multi_images(self, task_key, batch, adapter_mode="none", deterministic=True):
        """Reference ``vilt.py:266-310``: one pass per image with
        ``image_token_type_idx = i + 1``, concat pooled outputs.
        ``pixel_values``: [B, num_images, H, W, C]."""
        spec = self.task_heads[task_key]
        pooled_all = []
        for i in range(spec.num_images):
            _, pooled = self.encoder(
                input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                token_type_ids=batch.get("token_type_ids"),
                pixel_values=batch["pixel_values"][:, i],
                pixel_mask=None if batch.get("pixel_mask") is None else batch["pixel_mask"][:, i],
                image_token_type_idx=i + 1,
                adapter_mode=adapter_mode,
                deterministic=deterministic,
            )
            pooled_all.append(pooled)
        pooled = jnp.concatenate(pooled_all, axis=-1)
        logits = self._heads[task_key](pooled)
        return pooled, logits

    def forward_multi_choice(self, task_key, batch, adapter_mode="none", deterministic=True):
        """Reference ``vilt.py:312-353``: one pass per text choice against the
        same image; head scores each choice.  ``input_ids``: [B, C, L]."""
        spec = self.task_heads[task_key]
        pooled_all = []
        for i in range(spec.num_choices):
            _, pooled = self.encoder(
                input_ids=batch["input_ids"][:, i],
                attention_mask=batch["attention_mask"][:, i],
                token_type_ids=None if batch.get("token_type_ids") is None else batch["token_type_ids"][:, i],
                pixel_values=batch["pixel_values"],
                pixel_mask=batch.get("pixel_mask"),
                adapter_mode=adapter_mode,
                deterministic=deterministic,
            )
            pooled_all.append(pooled)
        pooled = jnp.stack(pooled_all, axis=1)  # [B, C, d]
        logits = self._heads[task_key](pooled, deterministic=deterministic)
        return pooled, logits.squeeze(-1)
