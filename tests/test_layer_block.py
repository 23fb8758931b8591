"""Whole-layer backward kernel (ops/layer_block.py) == the composable
PreLNLayer path: forward equality and gradient parity (x + adapter params),
in fp32 interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from feddat_tpu.configs.core import AdapterSpec
from feddat_tpu.models.layers import PreLNLayer
from feddat_tpu.ops.layer_block import layer_block

D, H, F, S, B = 64, 4, 128, 24, 3
RF = 4  # bottleneck = 16
EPS = 1e-12


def _setup(names=("adapter_0", "adapter_1", "adapter_2")):
    spec = AdapterSpec(names=names, reduction_factor=RF)
    layer = PreLNLayer(
        hidden_size=D, num_heads=H, intermediate_size=F, adapter=spec,
        layer_norm_eps=EPS, attn_impl="auto",
    )
    rng = np.random.RandomState(0)
    x = rng.randn(B, S, D).astype(np.float32) * 0.3
    bias = np.zeros((B, 1, 1, S), np.float32)
    bias[0, :, :, -3:] = -1e9  # one row with padding
    params = layer.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(bias),
        adapter_mode="init_all",
    )["params"]
    # non-trivial LN params so the frozen-LN backward is actually exercised
    flat = traverse_util.flatten_dict(params)
    for k in list(flat):
        if k[-2] in ("norm_before", "norm_after") or "scale" in k[-1]:
            # crc32, not hash(): PYTHONHASHSEED randomization would make any
            # tolerance-boundary failure non-reproducible across processes
            import zlib

            key = jax.random.PRNGKey(zlib.crc32("/".join(k).encode()) % (2**31))
            flat[k] = flat[k] + 0.1 * jax.random.normal(key, flat[k].shape)
    params = traverse_util.unflatten_dict(flat)
    return layer, params, jnp.asarray(x), jnp.asarray(bias)


def _kernel_args(params, mode):
    """Extract layer_block's argument list from a PreLNLayer param tree."""
    p = params
    att = p["attention"]
    wq, bq = att["query"]["dense"]["kernel"], att["query"]["dense"]["bias"]
    wk, bk = att["key"]["kernel"], att["key"]["bias"]
    wv, bv = att["value"]["dense"]["kernel"], att["value"]["dense"]["bias"]
    wo, bo = att["out"]["kernel"], att["out"]["bias"]
    bqkv = jnp.stack([bq, bk, bv]).astype(jnp.float32)
    gb1 = jnp.stack([p["norm_before"]["scale"], p["norm_before"]["bias"]]).astype(jnp.float32)
    gb2 = jnp.stack([p["norm_after"]["scale"], p["norm_after"]["bias"]]).astype(jnp.float32)
    w1, b1 = p["mlp"]["intermediate"]["kernel"], p["mlp"]["intermediate"]["bias"]
    w2, b2 = p["mlp"]["output"]["kernel"], p["mlp"]["output"]["bias"]
    ad = p["adapter"]

    def quad(name):
        return (
            ad[f"{name}_down"]["kernel"], ad[f"{name}_down"]["bias"][None, :].astype(jnp.float32),
            ad[f"{name}_up"]["kernel"], ad[f"{name}_up"]["bias"][None, :].astype(jnp.float32),
        )

    if mode == "ensemble":
        a_name, b_name = "adapter_0", "adapter_2"
        w_a = w_b = 0.5
        use_b = True
    else:
        a_name, b_name = mode, mode
        w_a, w_b = 1.0, 0.0
        use_b = False
    wda, bda, wua, bua = quad(a_name)
    wdb, bdb, wub, bub = quad(b_name)
    return (
        (wq, wk, wv, wo, bqkv, bo[None, :].astype(jnp.float32), gb1, gb2,
         w1, b1[None, :].astype(jnp.float32), w2, b2[None, :].astype(jnp.float32),
         wda, bda, wua, bua, wdb, bdb, wub, bub),
        (w_a, w_b, use_b),
        a_name,
    )


def _run_kernel(params, x, bias, mode):
    weights, (w_a, w_b, use_b), a_name = _kernel_args(params, mode)
    return layer_block(
        x, *weights, bias,
        H, None, EPS, EPS, w_a, w_b, use_b, 1, True,  # interpret
    ), a_name


def test_layer_block_forward_matches_composable():
    layer, params, x, bias = _setup()
    for mode in ("ensemble", "adapter_1"):
        ref = layer.apply({"params": params}, x, bias, adapter_mode=mode)
        out, _ = _run_kernel(params, x, bias, mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_layer_block_grads_match_autodiff():
    layer, params, x, bias = _setup()
    gw = np.random.RandomState(1).randn(B, S, D).astype(np.float32)

    for mode in ("ensemble", "adapter_1"):
        weights, (w_a, w_b, use_b), a_name = _kernel_args(params, mode)

        def loss_ref(x_, pa):
            p2 = jax.tree_util.tree_map(lambda t: t, params)
            p2 = dict(p2)
            ad = dict(p2["adapter"])
            ad[f"{a_name}_down"] = {"kernel": pa[0], "bias": pa[1]}
            ad[f"{a_name}_up"] = {"kernel": pa[2], "bias": pa[3]}
            p2["adapter"] = ad
            out = layer.apply({"params": p2}, x_, bias, adapter_mode=mode)
            return jnp.sum(out * gw)

        pa0 = (
            params["adapter"][f"{a_name}_down"]["kernel"],
            params["adapter"][f"{a_name}_down"]["bias"],
            params["adapter"][f"{a_name}_up"]["kernel"],
            params["adapter"][f"{a_name}_up"]["bias"],
        )
        gx_ref, gpa_ref = jax.grad(loss_ref, argnums=(0, 1))(x, pa0)

        def loss_k(x_, wda, bda, wua, bua):
            w = list(weights)
            w[12], w[13], w[14], w[15] = wda, bda, wua, bua
            out = layer_block(x_, *w, bias, H, None, EPS, EPS, w_a, w_b, use_b, 1, True)
            return jnp.sum(out * gw)

        gx, gwda, gbda, gwua, gbua = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(
            x, weights[12], weights[13], weights[14], weights[15]
        )
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gwda), np.asarray(gpa_ref[0]), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gbda[0]), np.asarray(gpa_ref[1]), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gwua), np.asarray(gpa_ref[2]), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gbua[0]), np.asarray(gpa_ref[3]), rtol=2e-4, atol=2e-5)


def _setup_impl(attn_impl):
    spec = AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=RF)
    layer = PreLNLayer(
        hidden_size=D, num_heads=H, intermediate_size=F, adapter=spec,
        layer_norm_eps=EPS, attn_impl=attn_impl,
    )
    return layer


def test_preln_layer_impl_param_tree_identical():
    """attn_impl='layer' must init the exact same param tree as 'auto'
    (paths + shapes) — converters/partitioning/jit-cache depend on it."""
    _, params_auto, x, bias = _setup()
    layer = _setup_impl("layer")
    params_layer = layer.init(
        jax.random.PRNGKey(0), x, bias, adapter_mode="init_all"
    )["params"]
    flat_a = traverse_util.flatten_dict(params_auto)
    flat_l = traverse_util.flatten_dict(params_layer)
    assert set(flat_a) == set(flat_l)
    for k in flat_a:
        assert flat_a[k].shape == flat_l[k].shape, k


def test_preln_layer_impl_matches_auto():
    """PreLNLayer(attn_impl='layer') == the composable path: forward and
    (x + active-adapter) grads, same params, fp32 interpret on CPU."""
    layer_auto, params, x, bias = _setup()
    layer_k = _setup_impl("layer")
    gw = np.random.RandomState(3).randn(B, S, D).astype(np.float32)

    for mode, a_name in (("ensemble", "adapter_0"), ("adapter_1", "adapter_1")):

        def loss(lyr, x_, pa):
            p2 = dict(params)
            ad = dict(p2["adapter"])
            ad[f"{a_name}_down"] = {"kernel": pa[0], "bias": pa[1]}
            ad[f"{a_name}_up"] = {"kernel": pa[2], "bias": pa[3]}
            p2["adapter"] = ad
            out = lyr.apply({"params": p2}, x_, bias, adapter_mode=mode)
            return jnp.sum(out * gw), out

        pa0 = (
            params["adapter"][f"{a_name}_down"]["kernel"],
            params["adapter"][f"{a_name}_down"]["bias"],
            params["adapter"][f"{a_name}_up"]["kernel"],
            params["adapter"][f"{a_name}_up"]["bias"],
        )
        (_, out_ref), (gx_ref, gpa_ref) = jax.value_and_grad(
            lambda x_, pa: loss(layer_auto, x_, pa), argnums=(0, 1), has_aux=True
        )(x, pa0)
        (_, out_k), (gx, gpa) = jax.value_and_grad(
            lambda x_, pa: loss(layer_k, x_, pa), argnums=(0, 1), has_aux=True
        )(x, pa0)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=2e-5)
        for got, ref in zip(gpa, gpa_ref):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_layer_kernel_gate_admits_albef_vit_s577():
    """ALBEF's ViT (S=577, bias=None, dropout 0.0) must be inside the layer
    kernel's regime (measured on v5e, PERF.md round 4); one past the 592
    padded cap must not."""
    layer = _setup_impl("layer")
    x577 = jnp.zeros((1, 577, D))
    x593 = jnp.zeros((1, 593, D))
    assert layer._layer_kernel_eligible(None, "adapter_0", True, None, x577)
    assert layer._layer_kernel_eligible(None, "ensemble", False, None, x577)
    assert not layer._layer_kernel_eligible(None, "adapter_0", True, None, x593)


def test_preln_layer_impl_matches_auto_large_s_split():
    """Fast-tier numerics for the large-S regime split: S=456 pads past
    LN_FWD_FUSED_MAX_S=448, so the forward computes LN1 in XLA and calls
    the plain kernel while the backward re-derives LN1 in-kernel from the
    saved pre-LN x — fwd + (x, adapter) grad parity vs the composable
    path (the S=577 ALBEF-shape variant below is the slow-tier check)."""
    layer_auto = _setup_impl("auto")
    layer_k = _setup_impl("layer")
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 456, D).astype(np.float32) * 0.3)
    params = layer_auto.init(
        jax.random.PRNGKey(0), x, None, adapter_mode="init_all"
    )["params"]

    def loss(lyr, x_, p):
        out = lyr.apply({"params": p}, x_, None, adapter_mode="ensemble")
        return jnp.sum(out**2), out

    (_, out_ref), (gx_ref, gp_ref) = jax.value_and_grad(
        lambda x_, p: loss(layer_auto, x_, p), argnums=(0, 1), has_aux=True
    )(x, params)
    (_, out_k), (gx, gp) = jax.value_and_grad(
        lambda x_, p: loss(layer_k, x_, p), argnums=(0, 1), has_aux=True
    )(x, params)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=1e-3)
    for name in ("adapter_0_down", "adapter_0_up"):
        got = gp["adapter"][name]["kernel"]
        ref = gp_ref["adapter"][name]["kernel"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=1e-3)


@pytest.mark.slow
def test_preln_layer_impl_matches_auto_s577():
    """Numerics at the ALBEF-ViT shape: S=577 (pads to 592), bias=None,
    fwd + (x, adapter) grad parity vs the composable path — the regime the
    default `--attn_impl layer` ALBEF config runs in."""
    layer_auto = _setup_impl("auto")
    layer_k = _setup_impl("layer")
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 577, D).astype(np.float32) * 0.3)
    params = layer_auto.init(
        jax.random.PRNGKey(0), x, None, adapter_mode="init_all"
    )["params"]

    def loss(lyr, x_, p):
        out = lyr.apply({"params": p}, x_, None, adapter_mode="ensemble")
        return jnp.sum(out**2), out

    (_, out_ref), (gx_ref, gp_ref) = jax.value_and_grad(
        lambda x_, p: loss(layer_auto, x_, p), argnums=(0, 1), has_aux=True
    )(x, params)
    (_, out_k), (gx, gp) = jax.value_and_grad(
        lambda x_, p: loss(layer_k, x_, p), argnums=(0, 1), has_aux=True
    )(x, params)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-4, atol=1e-3)
    for name in ("adapter_0_down", "adapter_0_up"):
        got = gp["adapter"][name]["kernel"]
        ref = gp_ref["adapter"][name]["kernel"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=1e-3)


def test_layer_block_frozen_partner_gets_zero_grads():
    """The ensemble's second member (DAT's frozen adapter_2 teacher) and the
    backbone weights must receive exactly-zero cotangents."""
    layer, params, x, bias = _setup()
    weights, (w_a, w_b, use_b), _ = _kernel_args(params, "ensemble")
    gw = np.random.RandomState(2).randn(B, S, D).astype(np.float32)

    def loss(wq, wdb):
        w = list(weights)
        w[0], w[16] = wq, wdb
        out = layer_block(x, *w, bias, H, None, EPS, EPS, w_a, w_b, use_b, 1, True)
        return jnp.sum(out * gw)

    gq, gdb = jax.grad(loss, argnums=(0, 1))(weights[0], weights[16])
    assert float(jnp.abs(gq).max()) == 0.0
    assert float(jnp.abs(gdb).max()) == 0.0
