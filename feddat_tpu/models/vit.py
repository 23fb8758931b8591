"""ViT-B/16 visual encoder for ALBEF.

Behavioral port of the reference's vendored timm-style ViT
(``src/modeling/models/vit.py:12-217``): patch conv + CLS + learned
positions, pre-LN blocks (eps 1e-6), optional DAT adapter appended after the
MLP residual of every block (``vit.py:93-110``) — which is exactly the
``PreLNLayer`` adapter slot, so the blocks are a scanned ``PreLNLayer``
stack.  ``interpolate_pos_embed`` (bicubic grid resize for checkpoint
surgery, ``vit.py:193-217``) lives in ``feddat_tpu/utils/checkpoint_convert``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from feddat_tpu.configs.core import AdapterSpec, AlbefModelConfig, LoraSpec
from feddat_tpu.models.layers import PreLNLayer


class VisionTransformer(nn.Module):
    cfg: AlbefModelConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, pixel_values, adapter_mode: str = "none", deterministic: bool = True):
        """pixel_values [B, H, W, 3] -> token states [B, 1+N, D]."""
        c = self.cfg
        b = pixel_values.shape[0]
        if pixel_values.dtype == jnp.uint8:
            # RAW-uint8 pixel path (see ViltEncoder): CLIP normalization
            # on-chip, 4x less host->device traffic.  ALBEF resizes to the
            # exact (384, 384) — no canvas pad, so no mask multiply needed.
            from feddat_tpu.data.images import CLIP_MEAN, CLIP_STD

            pixel_values = (
                pixel_values.astype(jnp.float32) / 255.0 - CLIP_MEAN
            ) / CLIP_STD
        init = nn.initializers.normal(stddev=0.02)
        x = nn.Conv(
            c.vision_width,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            kernel_init=init,
            dtype=self.dtype,
            name="patch_embed",
        )(pixel_values)
        x = x.reshape(b, -1, c.vision_width)
        n = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.vision_width))
        pos = self.param("pos_embed", nn.initializers.zeros, (1, n + 1, c.vision_width))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c.vision_width)), x], axis=1)
        x = x + pos.astype(self.dtype)
        # (timm's pos_drop is rate 0.0 in the reference config — no-op, omitted)

        layer_kwargs = dict(
            hidden_size=c.vision_width,
            num_heads=c.vision_heads,
            intermediate_size=int(c.vision_width * c.vision_mlp_ratio),
            adapter=c.adapter,
            dropout_rate=0.0,
            attention_dropout=0.0,
            layer_norm_eps=c.vision_layer_norm_eps,
            lora=c.lora,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            logits_dtype=jnp.dtype(c.attention_logits_dtype),
            fuse_ln=getattr(c, "fuse_ln", False),
        )

        use_remat = c.remat
        remat_policy = getattr(c, "remat_policy", "full")

        class _Body(nn.Module):
            @nn.compact
            def __call__(self, carry, _):
                block = PreLNLayer(**layer_kwargs, name="block")
                # whole-layer kernel: its vjp saves its own minimal residual
                # set — remat would only discard it (see vilt.py)
                if use_remat and layer_kwargs["attn_impl"] != "layer":
                    from feddat_tpu.ops.remat_policy import resolve_remat_policy

                    # the ViT does not wire the structural attention/min_save
                    # variants -> clear error instead of silent full remat
                    policy = resolve_remat_policy(remat_policy, supports_structural=False)
                    out = nn.remat(
                        lambda mdl, h: mdl(h, None, adapter_mode, deterministic),
                        policy=policy,
                    )(block, carry)
                else:
                    out = block(carry, None, adapter_mode, deterministic)
                return out, None

        Blocks = nn.scan(
            _Body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=c.vision_layers,
        )
        x, _ = Blocks(name="blocks")(x, None)
        return nn.LayerNorm(epsilon=c.vision_layer_norm_eps, dtype=self.dtype, name="final_norm")(x)
