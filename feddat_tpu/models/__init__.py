"""Model registry.

The reference's ``load_encoder_map`` / ``create_continual_learner_map``
(``src/modeling/__init__.py:5-17``) as typed factories.  ``flava`` is listed
by the reference but has no implementation there (dead, SURVEY.md §2.9) and
is rejected here with a clear error.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

ALLOWED_CL_ENCODERS = ["vilt", "viltbert", "albef_distill", "albef_no_distill"]


def create_model(
    encoder_name: str,
    task_heads: Dict[str, "TaskHeadSpec"],
    peft_mode,
    adapter_reduction_factor: int = 16,
    dtype: str = "float32",
    image_size: Optional[Tuple[int, int]] = None,
    lora_enabled: Optional[bool] = None,
    prompt_enabled: Optional[bool] = None,
    remat: bool = False,
    remat_policy: str = "full",
    attn_impl: str = "auto",
    attention_logits_dtype: str = "float32",
    text_remat_policy: str = "full",
):
    """-> (model, model_config).  ``task_heads`` maps task_key -> TaskHeadSpec
    (ignored by ALBEF, whose head is the LM decoder).

    TPU performance knobs (PERF.md): ``remat`` (gradient checkpointing —
    required for large batches), ``attn_impl`` ('auto' XLA | 'fused' Pallas
    short-seq | 'flash' long-seq), ``attention_logits_dtype`` ('bfloat16'
    halves the attention backward's HBM traffic, +14-16% measured).
    """
    import jax.numpy as jnp

    from feddat_tpu.configs.core import (
        AlbefModelConfig,
        LoraSpec,
        PEFTMode,
        PromptSpec,
        ViltModelConfig,
        adapter_spec_for_mode,
    )

    jdtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    # The whole-attention-block kernel has a FROZEN-projection backward (zero
    # weight/bias cotangents for q/k/v/out) — modes that train those weights
    # would silently get zero gradients.  Guard here (not only in the CLI) so
    # programmatic callers can't build a silently-broken training model.
    # LORA is structurally ineligible anyway (the kernel route checks
    # ``not lora.enabled``) but is rejected too for a clear error.  Eval-only
    # users of these modes should pass attn_impl='auto' (the CLI downgrades
    # for them automatically).
    if attn_impl in ("block", "layer") and peft_mode in (
        PEFTMode.FULL, PEFTMode.BIAS, PEFTMode.LORA, PEFTMode.FREEZE_BOTTOM_K
    ):
        raise ValueError(
            f"attn_impl={attn_impl!r} assumes frozen attention projections; "
            f"peft_mode={peft_mode.value!r} trains them (their gradients would "
            "silently be zero).  Use attn_impl='auto' for this mode."
        )
    # 'layer' (whole-layer kernel, ops/layer_block.py) additionally freezes
    # the LayerNorms and FFN; 'norm' would silently get zero LN gradients.
    if attn_impl == "layer" and peft_mode == PEFTMode.NORM:
        raise ValueError(
            "attn_impl='layer' fuses the (frozen) LayerNorms into the kernel; "
            "peft_mode='norm' trains them.  Use attn_impl='auto' or 'block'."
        )
    adapter = adapter_spec_for_mode(peft_mode, adapter_reduction_factor)
    lora = LoraSpec(enabled=(peft_mode == PEFTMode.LORA if lora_enabled is None else lora_enabled))
    prompt = PromptSpec(enabled=(peft_mode == PEFTMode.PROMPT if prompt_enabled is None else prompt_enabled))

    # 'norm' trains the LayerNorm params: keep LN OUTSIDE the block kernel
    # there (the kernel's fused-LN backward returns zero LN cotangents).
    fuse_ln = peft_mode != PEFTMode.NORM

    if encoder_name in ("vilt", "viltbert"):
        cfg = ViltModelConfig(
            adapter=adapter,
            lora=lora,
            prompt=prompt,
            remat=remat,
            remat_policy=remat_policy,
            attention_logits_dtype=attention_logits_dtype,
            fuse_ln=fuse_ln,
            **({"image_size": image_size} if image_size else {}),
        )
        if encoder_name == "viltbert":
            from feddat_tpu.models.viltbert import ViltBertContinualLearner

            return ViltBertContinualLearner(cfg, task_heads, dtype=jdtype, attn_impl=attn_impl), cfg
        from feddat_tpu.models.vilt import ViltContinualLearner

        return ViltContinualLearner(cfg, task_heads, dtype=jdtype, attn_impl=attn_impl), cfg

    if encoder_name in ("albef_distill", "albef_no_distill"):
        from feddat_tpu.models.albef import AlbefModel

        cfg = AlbefModelConfig(
            adapter=adapter,
            lora=lora,
            prompt=prompt,
            remat=remat,
            remat_policy=remat_policy,
            attention_logits_dtype=attention_logits_dtype,
            fuse_ln=fuse_ln,
            distill=(encoder_name == "albef_distill"),
            text_remat_policy=text_remat_policy,
        )
        # 'block'/'layer' on ALBEF target the ViT tower (S=577, the
        # FLOP-dominant stack); the text/fusion/decoder towers keep the XLA
        # path (post-LN BERT layers — the pre-LN kernels don't apply, and
        # their training dropout / causal/cross biases fall back anyway).
        # 'layer' routes the 12 ViT blocks (all adapter sites, dropout 0.0,
        # S=577 <= the kernel's measured 592 cap) through the whole-layer
        # backward kernel: 116.4 vs 98.6 samples/s on the fused DAT step
        # (PERF.md round 4).
        if attn_impl in ("block", "layer"):
            return AlbefModel(cfg, dtype=jdtype, attn_impl="auto",
                              vision_attn_impl=attn_impl), cfg
        return AlbefModel(cfg, dtype=jdtype, attn_impl=attn_impl), cfg

    raise ValueError(
        f"unknown encoder {encoder_name!r}; allowed: {ALLOWED_CL_ENCODERS} "
        "('flava' is declared but unimplemented in the reference too)"
    )
