"""Adapter-cell math vs. the reference semantics
(``/root/reference/src/modeling/models/adapter.py:124-163``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feddat_tpu.configs.core import AdapterSpec
from feddat_tpu.models.adapters import (
    MODE_ENSEMBLE,
    MODE_INIT,
    AdapterCell,
    ensemble_members,
)

DIM = 16
SPEC_DAT = AdapterSpec(names=("adapter_0", "adapter_1", "adapter_2"), reduction_factor=4)
SPEC_SINGLE = AdapterSpec(names=("adapter",), reduction_factor=4)


def _init(spec):
    cell = AdapterCell(spec, DIM)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, DIM).astype(np.float32))
    params = jax.jit(
        lambda r, z: cell.init(r, z, method=lambda m, z: m.delta(z, MODE_INIT))
    )(jax.random.PRNGKey(1), x)["params"]
    return cell, params, x


def _manual_single(params, name, z):
    down = z @ params[f"{name}_down"]["kernel"] + params[f"{name}_down"]["bias"]
    down = np.maximum(down, 0.0)
    return down @ params[f"{name}_up"]["kernel"] + params[f"{name}_up"]["bias"]


def test_single_mode_matches_manual():
    cell, params, x = _init(SPEC_DAT)
    out = cell.apply({"params": params}, x, "adapter_1", method=lambda m, z, mode: m.delta(z, mode))
    ref = _manual_single(jax.tree_util.tree_map(np.asarray, params), "adapter_1", np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_ensemble_is_fixed_half_mix_of_0_and_2():
    cell, params, x = _init(SPEC_DAT)
    out = cell.apply({"params": params}, x, MODE_ENSEMBLE, method=lambda m, z, mode: m.delta(z, mode))
    p = jax.tree_util.tree_map(np.asarray, params)
    ref = 0.5 * _manual_single(p, "adapter_0", np.asarray(x)) + 0.5 * _manual_single(
        p, "adapter_2", np.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_ensemble_members_fallback_without_teacher():
    assert ensemble_members(("adapter_0", "adapter_1", "adapter_2")) == ("adapter_0", "adapter_2")
    assert ensemble_members(("adapter_0", "adapter_1")) == ("adapter_0", "adapter_1")


def test_param_tree_is_mode_independent():
    cell, params, x = _init(SPEC_DAT)
    # applying any mode with the init-time tree must not fail
    for mode in ("adapter_0", "adapter_1", "adapter_2", MODE_ENSEMBLE):
        cell.apply({"params": params}, x, mode, method=lambda m, z, mode: m.delta(z, mode))


def test_unknown_mode_raises():
    cell, params, x = _init(SPEC_SINGLE)
    with pytest.raises(ValueError):
        cell.apply({"params": params}, x, "adapter_7", method=lambda m, z, mode: m.delta(z, mode))
