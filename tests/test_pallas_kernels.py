"""Pallas kernels vs XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feddat_tpu.ops.adapter_fused import _reference, fused_ensemble_adapter
from feddat_tpu.ops.attention import dot_product_attention, mask_to_bias
from feddat_tpu.ops.flash import flash_attention


def _qkv(rng, b=2, h=2, sq=40, skv=40, d=16):
    return (
        jnp.asarray(rng.randn(b, h, sq, d), jnp.float32),
        jnp.asarray(rng.randn(b, h, skv, d), jnp.float32),
        jnp.asarray(rng.randn(b, h, skv, d), jnp.float32),
    )


def test_flash_matches_xla_no_bias():
    rng = np.random.RandomState(0)
    q, k, v = _qkv(rng)
    ref = dot_product_attention(q, k, v, impl="xla")
    out = flash_attention(q, k, v, None, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_flash_matches_xla_with_padding_mask():
    rng = np.random.RandomState(1)
    q, k, v = _qkv(rng, sq=37, skv=53)  # deliberately non-multiple of block
    mask = jnp.asarray((rng.rand(2, 53) > 0.3).astype(np.int32))
    bias = mask_to_bias(mask)
    ref = dot_product_attention(q, k, v, bias, impl="xla")
    out = flash_attention(q, k, v, bias, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_flash_gradients_match_xla():
    rng = np.random.RandomState(2)
    q, k, v = _qkv(rng, sq=16, skv=16, d=8)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, None, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, impl="xla") ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_gradients_match_xla_padding_mask_cross_shapes():
    """Blocked Pallas backward: padding bias + S_q != S_kv, non-block-multiple
    sizes (exercises NEG_INF kv padding and zero q-row padding in the bwd)."""
    rng = np.random.RandomState(21)
    q, k, v = _qkv(rng, b=2, h=3, sq=37, skv=53, d=8)
    mask = jnp.asarray((rng.rand(2, 53) > 0.3).astype(np.int32))
    bias = mask_to_bias(mask)

    gf = jax.grad(
        lambda q, k, v: jnp.sum(flash_attention(q, k, v, bias, None, True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda q, k, v: jnp.sum(dot_product_attention(q, k, v, bias, impl="xla") ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_full_query_bias_fwd_and_grads():
    """[1, 1, Sq, Skv] causal+padding-style bias (per-query rows) stays
    compact through the BlockSpec index maps in both directions."""
    from feddat_tpu.ops.attention import causal_bias

    rng = np.random.RandomState(22)
    q, k, v = _qkv(rng, b=2, h=2, sq=20, skv=20, d=8)
    bias = causal_bias(20)  # [1, 1, S, S]

    ref = dot_product_attention(q, k, v, bias, impl="xla")
    out = flash_attention(q, k, v, bias, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    gf = jax.grad(
        lambda q, k, v: jnp.sum(flash_attention(q, k, v, bias, None, True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda q, k, v: jnp.sum(dot_product_attention(q, k, v, bias, impl="xla") ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_impl_falls_back_on_cross_attention_and_2d_bias():
    """impl='fused' must not crash at ALBEF/xbert sites: cross-attention
    shapes and [B,1,S,S] (causal+padding) biases route to XLA per site."""
    from feddat_tpu.ops.attention import causal_bias

    rng = np.random.RandomState(23)
    # cross-attention: S_q != S_kv
    q, k, v = _qkv(rng, b=2, h=2, sq=10, skv=24, d=8)
    ref = dot_product_attention(q, k, v, impl="xla")
    out = dot_product_attention(q, k, v, impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    # self-attention with a combined causal+padding [B,1,S,S] bias
    q2, k2, v2 = _qkv(rng, b=2, h=2, sq=12, skv=12, d=8)
    mask = jnp.asarray((rng.rand(2, 12) > 0.2).astype(np.int32))
    bias = mask_to_bias(mask) + causal_bias(12)
    ref2 = dot_product_attention(q2, k2, v2, bias, impl="xla")
    out2 = dot_product_attention(q2, k2, v2, bias, impl="fused")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-6)


def test_kernel_impls_fall_back_on_live_dropout():
    """Live attention dropout (viltbert/ALBEF text towers train at 0.1)
    routes 'fused'/'flash' to the XLA path — bitwise-identical to impl='xla'
    with the same rng (same bernoulli draw)."""
    rng = np.random.RandomState(24)
    q, k, v = _qkv(rng, b=1, h=2, sq=12, skv=12, d=8)
    key = jax.random.PRNGKey(0)
    ref = dot_product_attention(
        q, k, v, dropout_rate=0.5, dropout_rng=key, impl="xla"
    )
    for impl in ("fused", "flash"):
        out = dot_product_attention(
            q, k, v, dropout_rate=0.5, dropout_rng=key, impl=impl
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=0)


def _adapter_params(rng, d=32, r=8):
    return tuple(
        jnp.asarray(x, jnp.float32)
        for x in (rng.randn(d, r) * 0.1, rng.randn(r) * 0.1, rng.randn(r, d) * 0.1, rng.randn(d) * 0.1)
    )


def test_fused_adapter_matches_reference():
    rng = np.random.RandomState(3)
    h = jnp.asarray(rng.randn(2, 10, 32), jnp.float32)
    pa, pb = _adapter_params(rng), _adapter_params(rng)
    ref = _reference(h, pa, pb, 0.5)
    out = fused_ensemble_adapter(h, pa, pb, 0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_fused_adapter_gradients():
    rng = np.random.RandomState(4)
    h = jnp.asarray(rng.randn(3, 32), jnp.float32)
    pa, pb = _adapter_params(rng), _adapter_params(rng)

    g1 = jax.grad(lambda h, a, b: jnp.sum(fused_ensemble_adapter(h, a, b, 0.5, True) ** 2), argnums=(0, 1, 2))(h, pa, pb)
    g2 = jax.grad(lambda h, a, b: jnp.sum(_reference(h, a, b, 0.5) ** 2), argnums=(0, 1, 2))(h, pa, pb)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_attention_interface_routes_flash():
    rng = np.random.RandomState(5)
    q, k, v = _qkv(rng, sq=8, skv=8, d=8)
    with pytest.raises(ValueError):
        dot_product_attention(q, k, v, impl="nope")


def test_fused_short_attention_matches_xla():
    from feddat_tpu.ops.fused_attention import fused_short_attention

    rng = np.random.RandomState(7)
    q, k, v = _qkv(rng, b=2, h=2, sq=24, skv=24, d=16)
    mask = jnp.asarray((rng.rand(2, 24) > 0.3).astype(np.int32))
    bias = mask_to_bias(mask)
    ref = dot_product_attention(q, k, v, bias, impl="xla")
    out = fused_short_attention(q, k, v, bias, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_short_attention_grads_match_xla():
    from feddat_tpu.ops.fused_attention import fused_short_attention

    rng = np.random.RandomState(8)
    q, k, v = _qkv(rng, b=1, h=2, sq=16, skv=16, d=8)
    mask = jnp.asarray((rng.rand(1, 16) > 0.2).astype(np.int32))
    bias = mask_to_bias(mask)

    gf = jax.grad(lambda q, k, v: jnp.sum(fused_short_attention(q, k, v, bias, None, True) ** 2), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(dot_product_attention(q, k, v, bias, impl="xla") ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


# ---- attention-block kernel (ops/attn_block.py) ---------------------------


def _block_inputs(rng, b=3, s=21, dm=32, h=4):
    x = jnp.asarray(rng.randn(b, s, dm) * 0.5, jnp.float32)
    ws = [jnp.asarray(rng.randn(dm, dm) * 0.05, jnp.float32) for _ in range(4)]
    bqkv = jnp.asarray(rng.randn(3, dm) * 0.02, jnp.float32)
    bo = jnp.asarray(rng.randn(1, dm) * 0.02, jnp.float32)
    mask = jnp.asarray((rng.rand(b, s) > 0.25).astype(np.int32))
    bias = mask_to_bias(mask)
    return x, ws, bqkv, bo, bias


def _block_reference(x, ws, bqkv, bo, bias, h):
    wq, wk, wv, wo = ws
    b, s, dm = x.shape
    d = dm // h

    def split(t):
        return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    q = split(x @ wq + bqkv[0])
    k = split(x @ wk + bqkv[1])
    v = split(x @ wv + bqkv[2])
    ctx = dot_product_attention(q, k, v, bias, impl="xla")
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, dm)
    return ctx @ wo + bo[0]


def test_attn_block_matches_composed_reference():
    from feddat_tpu.ops.attn_block import attn_block

    rng = np.random.RandomState(11)
    x, ws, bqkv, bo, bias = _block_inputs(rng)
    ref = _block_reference(x, ws, bqkv, bo, bias, 4)
    out = attn_block(x, *ws, bqkv, bo, None, bias, 4, None, 1, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
    # multi-element grid blocks with batch padding (b=3, block_b=2 -> pad 4)
    out2 = attn_block(x, *ws, bqkv, bo, None, bias, 4, None, 2, True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_attn_block_input_grads_match_reference():
    from feddat_tpu.ops.attn_block import attn_block

    rng = np.random.RandomState(12)
    x, ws, bqkv, bo, bias = _block_inputs(rng, b=2, s=13)

    gk = jax.grad(lambda x: jnp.sum(attn_block(x, *ws, bqkv, bo, None, bias, 4, None, 1, True) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(_block_reference(x, ws, bqkv, bo, bias, 4) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-4, atol=1e-5)


def test_attn_block_weight_grads_are_zero_by_contract():
    """The frozen-projection contract: weight cotangents are exactly zero
    (the kernel must never be routed to modes that train the projections —
    guarded in cli.py and layers.py)."""
    from feddat_tpu.ops.attn_block import attn_block

    rng = np.random.RandomState(13)
    x, ws, bqkv, bo, bias = _block_inputs(rng, b=1, s=9)
    g = jax.grad(
        lambda wq: jnp.sum(attn_block(x, wq, ws[1], ws[2], ws[3], bqkv, bo, None, bias, 4, None, 1, True))
    )(ws[0])
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_vilt_block_impl_matches_auto_end_to_end():
    """ViLT forward + DAT-trainable grads: attn_impl='block' vs 'auto' on the
    same params (the param tree is identical by construction)."""
    from feddat_tpu.configs.core import AdapterSpec, ViltModelConfig
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.peft.partition import label_params
    from flax import traverse_util

    cfg = ViltModelConfig(
        vocab_size=500, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_text_len=12, image_size=(64, 64), patch_size=32,
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=4),
        fuse_ln=True,  # exercise the LN-fused kernel end-to-end
    )
    m0 = ViltContinualLearner(cfg, {"fed": TaskHeadSpec(num_labels=7)})
    mb = ViltContinualLearner(cfg, {"fed": TaskHeadSpec(num_labels=7)}, attn_impl="block")
    rng = np.random.RandomState(14)
    batch = {
        "input_ids": rng.randint(1, 500, size=(2, 12)).astype(np.int32),
        "attention_mask": np.concatenate(
            [np.ones((2, 8), np.int32), np.zeros((2, 4), np.int32)], axis=1
        ),
        "pixel_values": rng.randn(2, 64, 64, 3).astype(np.float32),
    }
    params = init_vilt_params(m0, jax.random.PRNGKey(0), batch)

    _, l0 = m0.apply({"params": params}, "fed", batch, adapter_mode="ensemble", deterministic=True)
    _, lb = mb.apply({"params": params}, "fed", batch, adapter_mode="ensemble", deterministic=True)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(l0), rtol=1e-4, atol=1e-5)

    labels = label_params(params)
    flat = traverse_util.flatten_dict(params)
    flabels = traverse_util.flatten_dict(labels)
    sub = {k: flat[k] for k, l in flabels.items() if l in ("shared", "local")}

    def loss(model, s):
        full = dict(flat)
        full.update(s)
        _, lg = model.apply(
            {"params": traverse_util.unflatten_dict(full)}, "fed", batch,
            adapter_mode="ensemble", deterministic=True,
        )
        return jnp.sum(lg ** 2)

    g0 = jax.grad(lambda s: loss(m0, s))(sub)
    gb = jax.grad(lambda s: loss(mb, s))(sub)
    for k in sub:
        np.testing.assert_allclose(np.asarray(gb[k]), np.asarray(g0[k]), rtol=1e-3, atol=1e-5)


def test_vilt_layer_impl_matches_auto_end_to_end():
    """ViLT forward + DAT-trainable grads: attn_impl='layer' (whole-layer
    backward kernel) vs 'auto' on the same params."""
    from feddat_tpu.configs.core import AdapterSpec, ViltModelConfig
    from feddat_tpu.models.vilt import TaskHeadSpec, ViltContinualLearner, init_vilt_params
    from feddat_tpu.peft.partition import label_params
    from flax import traverse_util

    cfg = ViltModelConfig(
        vocab_size=500, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_text_len=12, image_size=(64, 64), patch_size=32,
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=4),
    )
    m0 = ViltContinualLearner(cfg, {"fed": TaskHeadSpec(num_labels=7)})
    ml = ViltContinualLearner(cfg, {"fed": TaskHeadSpec(num_labels=7)}, attn_impl="layer")
    rng = np.random.RandomState(15)
    batch = {
        "input_ids": rng.randint(1, 500, size=(2, 12)).astype(np.int32),
        "attention_mask": np.concatenate(
            [np.ones((2, 8), np.int32), np.zeros((2, 4), np.int32)], axis=1
        ),
        "pixel_values": rng.randn(2, 64, 64, 3).astype(np.float32),
    }
    params = init_vilt_params(m0, jax.random.PRNGKey(0), batch)
    params_l = init_vilt_params(ml, jax.random.PRNGKey(0), batch)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_l)

    labels = label_params(params)
    flat = traverse_util.flatten_dict(params)
    flabels = traverse_util.flatten_dict(labels)
    sub = {k: flat[k] for k, l in flabels.items() if l in ("shared", "local")}

    def loss(model, s, mode):
        full = dict(flat)
        full.update(s)
        _, lg = model.apply(
            {"params": traverse_util.unflatten_dict(full)}, "fed", batch,
            adapter_mode=mode, deterministic=True,
        )
        return jnp.sum(lg ** 2)

    for mode in ("ensemble", "adapter_1"):
        l0 = loss(m0, sub, mode)
        ll = loss(ml, sub, mode)
        np.testing.assert_allclose(float(ll), float(l0), rtol=1e-4)
        g0 = jax.grad(lambda s: loss(m0, s, mode))(sub)
        gl = jax.grad(lambda s: loss(ml, s, mode))(sub)
        for k in sub:
            np.testing.assert_allclose(
                np.asarray(gl[k]), np.asarray(g0[k]), rtol=1e-3, atol=1e-5, err_msg=str(k)
            )


def test_albef_vision_block_impl_matches_auto():
    """ALBEF ViT tower with attn_impl='block' (vision only): encode_train
    losses match the composable path on the same params."""
    from feddat_tpu.configs.core import AdapterSpec, AlbefBertConfig, AlbefModelConfig
    from feddat_tpu.models.albef import AlbefModel, init_albef_params

    cfg = AlbefModelConfig(
        image_res=64, patch_size=32, vision_width=32, vision_layers=2, vision_heads=4,
        bert=AlbefBertConfig(vocab_size=200, hidden_size=32, num_layers=4, num_heads=4,
                             intermediate_size=64, fusion_layer=2),
        decoder_layers=2, max_question_len=8, max_answer_len=6,
        adapter=AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=4),
        fuse_ln=True,
    )
    m0 = AlbefModel(cfg)
    mb = AlbefModel(cfg, vision_attn_impl="block")
    rng = np.random.RandomState(21)
    B, A, Lq, La, V = 2, 3, 8, 6, 200
    batch = {
        "pixel_values": rng.randn(B, 64, 64, 3).astype(np.float32),
        "question_ids": rng.randint(5, V, size=(B, Lq)).astype(np.int32),
        "question_mask": np.ones((B, Lq), np.int32),
        "answer_ids": rng.randint(5, V, size=(B, A, La)).astype(np.int32),
        "answer_mask": np.ones((B, A, La), np.int32),
        "answer_weights": np.full((B, A), 1.0 / A, np.float32),
    }
    p = init_albef_params(m0, jax.random.PRNGKey(0), batch)
    l0 = m0.apply({"params": p}, batch, adapter_mode="ensemble", deterministic=True,
                  method=type(m0).encode_train)
    lb = mb.apply({"params": p}, batch, adapter_mode="ensemble", deterministic=True,
                  method=type(mb).encode_train)
    for a, b in zip(jax.tree_util.tree_leaves(l0), jax.tree_util.tree_leaves(lb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_create_model_routes_block_to_albef_vision_tower():
    from feddat_tpu.configs.core import PEFTMode
    from feddat_tpu.models import create_model

    model, cfg = create_model(
        "albef_no_distill", {}, PEFTMode.DAT, attn_impl="block",
        remat=True, remat_policy="block_save_nox",
    )
    assert model.vision_attn_impl == "block"
    assert model.attn_impl == "auto"  # text towers stay on XLA
    assert cfg.remat_policy == "block_save_nox"


def test_attn_block_fused_ln_matches_composed_reference():
    """LN-fused variant: kernel(x, gb, eps) == reference(LayerNorm(x));
    input grads too (frozen LN scale/bias by contract)."""
    from feddat_tpu.ops.attn_block import attn_block

    rng = np.random.RandomState(15)
    x, ws, bqkv, bo, bias = _block_inputs(rng, b=2, s=17)
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(32), jnp.float32)
    beta = jnp.asarray(0.05 * rng.randn(32), jnp.float32)
    gb = jnp.stack([gamma, beta])
    eps = 1e-12

    def ln(x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
        return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta

    ref = _block_reference(ln(x), ws, bqkv, bo, bias, 4)
    out = attn_block(x, *ws, bqkv, bo, gb, bias, 4, None, 1, True, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    gk = jax.grad(lambda x: jnp.sum(attn_block(x, *ws, bqkv, bo, gb, bias, 4, None, 1, True, eps) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(_block_reference(ln(x), ws, bqkv, bo, bias, 4) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-4, atol=1e-5)


def test_attn_block_fused_ln_long_s_hybrid_bwd():
    """S > LN_BWD_FUSED_MAX_S routes the LN backward OUTSIDE the kernel
    (hybrid path used at ALBEF's S=577); gradients must still match the
    composed reference exactly."""
    from feddat_tpu.ops import attn_block as ab

    rng = np.random.RandomState(16)
    s = ab.LN_BWD_FUSED_MAX_S + 32  # forces the hybrid branch
    x, ws, bqkv, bo, bias = _block_inputs(rng, b=1, s=s, dm=32, h=4)
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(32), jnp.float32)
    beta = jnp.asarray(0.05 * rng.randn(32), jnp.float32)
    gb = jnp.stack([gamma, beta])
    eps = 1e-6

    def ln(x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
        return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta

    out = ab.attn_block(x, *ws, bqkv, bo, gb, bias, 4, None, 1, True, eps)
    ref = _block_reference(ln(x), ws, bqkv, bo, bias, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    gk = jax.grad(lambda x: jnp.sum(ab.attn_block(x, *ws, bqkv, bo, gb, bias, 4, None, 1, True, eps) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(_block_reference(ln(x), ws, bqkv, bo, bias, 4) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-4, atol=1e-5)
