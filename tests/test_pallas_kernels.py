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
